"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — typed schema, Arrow-
batched ``mapInPandas`` transforms, partition sizing.  Header-level
decode (container metadata: codec, dimensions, sample rate, duration)
is REAL, implemented with stdlib ``struct``/``zlib`` over PNG IHDR,
JPEG SOFn, and WAV RIFF chunks — no external codec library needed.
Only pixel/sample-level decode (feature extraction) remains STUBBED
(PIL/librosa are not in this container); those stubs either raise
``NotImplementedError`` (strict mode) or produce a deterministic fake
(plumbing-test mode), clearly marked below.

Design for 100 TB of media:
- media rows are *wide* (MBs of binary) — keep ``maxRecordsPerFile`` and
  ``files.maxPartitionBytes`` small so tasks stay memory-bounded;
- metadata travels in a typed struct column next to the blob, so filters
  (codec, resolution, duration) prune *before* any decode;
- decode/feature-extract run as ``mapInPandas`` (Arrow batches) —
  per-batch vectorized Python, never per-row;
- header probing (``probe_media_meta``) reads only the first bytes of
  each blob, so it is I/O-bound on blob bytes already in the partition,
  never CPU-bound on a codec.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried beside each blob; filterable without decoding.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_batch(blobs: pd.Series, strict: bool) -> pd.DataFrame:
    """STUB decode step.  Real implementation would call PIL/cv2 here
    (vectorized over the Arrow batch).  strict=True raises; otherwise a
    deterministic fake derived from the blob bytes keeps the plumbing
    testable."""
    if strict:
        raise NotImplementedError(
            "image decode requires PIL/cv2, not available in this container"
        )
    out = {
        "width": [(len(b) % 640) + 1 if b is not None else None for b in blobs],
        "height": [(len(b) % 480) + 1 if b is not None else None for b in blobs],
        "features": [
            [float(x) / 255.0 for x in (b[:8] if b else b"\x00" * 8)] if b is not None else None
            for b in blobs
        ],
    }
    return pd.DataFrame(out)


def extract_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract over Arrow batches via ``mapInPandas``.

    The iterator-of-batches signature means constant memory per task
    regardless of partition row count.  Batch row count is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (session-level);
    for MB-sized blobs set it low BEFORE building the session — there is
    no honest per-operator override, which is why no batch-size
    parameter is offered here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["blob"], strict)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": feats["width"],
                    "height": feats["height"],
                    "features": feats["features"],
                }
            )

    # metadata-first pruning (module design note): only image rows reach
    # the decode UDF — same filter as the audio/resize/frame siblings
    images = media.filter(F.col("meta.media_type") == "image")
    return images.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("mfcc", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_audio_features(
    media: DataFrame, strict: bool = False, window_ms: int = 25
) -> DataFrame:
    """Audio decode + MFCC-shaped features over Arrow batches.

    STUB: a real implementation would call librosa/torchaudio per batch;
    strict=True raises, otherwise a deterministic fake derived from the
    blob keeps the plumbing testable.  Window count comes from the typed
    metadata (no decode needed), so partition planning can filter/size
    on it first."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decode requires librosa/torchaudio, not available "
                    "in this container"
                )
            n_windows = [
                int(m["duration_ms"] // window_ms)
                if m is not None and m.get("duration_ms") is not None
                else None
                for m in pdf["meta"]
            ]
            mfcc = [
                [float(x) / 255.0 for x in (b[:13] if b else b"\x00" * 13)]
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_windows": n_windows, "mfcc": mfcc}
            )

    audio = media.filter(F.col("meta.media_type") == "audio")
    return audio.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize *plan*: compute target dims from typed metadata (pure
    SQL, no decode) so the stubbed decode/resize UDF only touches rows
    whose dims actually change — metadata-first pruning, the multimodal
    scale pattern."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return media.filter(F.col("meta.media_type") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into frame
    timestamps (pure SQL — no decode), so the expensive decode joins
    against an already-pruned frame list.  Decode itself is stubbed."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    videos = media.filter(
        (F.col("meta.media_type") == "video")
        # NULL / zero / negative duration means un-probed or corrupt
        # metadata: no frames, rather than a fabricated frame 0
        & (F.col("meta.duration_ms") > 0)
    )
    return videos.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                # cast BEFORE multiplying: i*every_ms in int32 wraps for
                # durations beyond ~2.1e9 ms
                lambda i: i.cast("bigint") * every_ms,
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        blob = bytes((i * 7 + j) % 256 for j in range(64 + (i % 32)))
        media_type = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                blob,
                {
                    "media_type": media_type,
                    "codec": "fake",
                    "width": 640 if media_type == "image" else None,
                    "height": 480 if media_type == "image" else None,
                    "duration_ms": 5000 if media_type != "image" else None,
                    "sample_rate": 16000 if media_type == "audio" else None,
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL header codecs (stdlib only: struct + zlib)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG,
#: CC=DAC are NOT frames and must be skipped).
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def encode_png(width: int, height: int) -> bytes:
    """Minimal fully-valid RGB8 PNG: signature + IHDR + one IDAT of
    zero-filled filtered scanlines + IEND, CRCs included.  Small dims
    only (raw buffer is 3*w*h) — this is a fixture/codec-test encoder,
    not a production image writer."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (3 * width)) * height  # filter byte + RGB row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def encode_jpeg_header(width: int, height: int) -> bytes:
    """Structurally valid JPEG container: SOI + JFIF APP0 + SOF0 carrying
    the dimensions + EOI.  Header-parseable (what probe_media_meta
    needs); it carries no entropy-coded scan, so a full pixel decoder
    would reject it — honest fixture for header-level tooling."""
    app0 = b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0))
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


def encode_wav(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    """Fully valid 16-bit PCM WAV (RIFF/fmt /data) with silent samples."""
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    riff_payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def parse_media_header(b: bytes | None) -> dict:
    """Parse container metadata from leading bytes — REAL decode, stdlib
    only.  PNG: IHDR width/height.  JPEG: walk marker segments to the
    first SOFn.  WAV: walk RIFF chunks for fmt (sample_rate) and data
    (byte length → duration).  Unknown/corrupt input degrades to None
    fields, never raises (corrupt blobs are data, not errors, at 100 TB).
    """
    out = {
        "codec": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    if not b or len(b) < 4:
        return out
    if b[:8] == _PNG_SIG and b[12:16] == b"IHDR" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        out.update(codec="png", width=w, height=h)
        return out
    if b[:2] == b"\xff\xd8":
        out["codec"] = "jpeg"
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xD9:  # EOI
                break
            if marker in _JPEG_SOF:
                if i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    out.update(width=w, height=h)
                break
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return out
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out["codec"] = "wav"
        i = 12
        byte_rate = None
        data_len = None
        while i + 8 <= len(b):
            tag = b[i : i + 4]
            size = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if tag == b"fmt " and i + 8 + 16 <= len(b):
                (_, _, rate, byte_rate, _, _) = struct.unpack(
                    "<HHIIHH", b[i + 8 : i + 24]
                )
                out["sample_rate"] = rate
            elif tag == b"data":
                data_len = size
            i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if byte_rate and data_len is not None:
            out["duration_ms"] = data_len * 1000 // byte_rate
        return out
    return out


PROBED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def probe_media_meta(media: DataFrame) -> DataFrame:
    """REAL metadata probe: parse container headers out of the blob
    column over Arrow batches.  This is the step that *populates* the
    typed ``meta`` struct other operators filter on — at ingest time it
    runs once per blob and every downstream decode prunes on its output.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(blob) for blob in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": [p["codec"] for p in parsed],
                    "width": pd.array([p["width"] for p in parsed], dtype="Int32"),
                    "height": pd.array([p["height"] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array(
                        [p["sample_rate"] for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p["duration_ms"] for p in parsed], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "blob").mapInPandas(run, schema=PROBED_META_SCHEMA)


def media_from_ids(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic real-blob media table keyed off an id column:
    id % 3 == 0 → PNG, 1 → JPEG header, 2 → WAV, with closed-form
    dims/rates (documented in the media_meta_extract oracle).  Blob
    encoding runs distributed in mapInPandas — the driver never sees
    a blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                if i % 3 == 0:
                    blobs.append(encode_png(16 + i % 48, 16 + i % 32))
                elif i % 3 == 1:
                    blobs.append(encode_jpeg_header(32 + i % 64, 24 + i % 40))
                else:
                    rate = 8000 + (i % 4) * 4000
                    blobs.append(encode_wav(rate, (i % 5 + 1) * rate // 10))
            yield pd.DataFrame({"media_id": pdf[id_col], "blob": blobs})

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("blob", T.BinaryType(), True),
        ]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=out_schema
    )
