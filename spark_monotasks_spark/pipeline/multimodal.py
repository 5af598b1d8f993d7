"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — typed schema, Arrow-
batched ``mapInPandas`` transforms, partition sizing — while the actual
codec calls are STUBBED (the image/audio libraries are not in this
container).  Each stub either raises ``NotImplementedError`` (strict
mode) or produces a deterministic fake (plumbing-test mode), clearly
marked below.

Design for 100 TB of media:
- media rows are *wide* (MBs of binary) — keep ``maxRecordsPerFile`` and
  ``files.maxPartitionBytes`` small so tasks stay memory-bounded;
- metadata travels in a typed struct column next to the blob, so filters
  (codec, resolution, duration) prune *before* any decode;
- decode/feature-extract run as ``mapInPandas`` (Arrow batches) —
  per-batch vectorized Python, never per-row.
"""

from __future__ import annotations

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
