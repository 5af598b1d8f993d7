"""Mergeable sketch states as plain DataFrame aggregation: count-min
(frequency) and fixed-width histograms (quantiles), completing the
family the HLL rollup starts (distinct).

The reference's sketch surface was HyperLogLog count-distinct (SURVEY
§2.4 ApproxCountDistinct); the modern training-data pipeline also needs
*frequency* estimation — which tokens/domains/urls dominate a 100 TB
corpus — and *distribution* estimation (length/score percentiles per
shard), both without shuffling full key/value tables.  A count-min
sketch (Cormode & Muthukrishnan 2005) answers the first: ``depth``
hash rows × ``width`` counters, est(key) = min over rows of
counter[h_i(key)], always ≥ the true count, within εN with ε = e/width
at probability 1 - e^-depth.  A fixed-width histogram answers the
second with error ≤ bin_width.

Everything here is plain DataFrame ops — no UDF, no binary blobs:

- the sketch IS a DataFrame of (row, bucket, cnt): trivially mergeable
  (union + sum — counts are decomposable), persistable as parquet,
  inspectable, and joinable;
- the row hashes are the engine-portable md5 family used across the
  pipeline: row i uses the i%4-th 32-bit hex chunk of
  md5(key ‖ '#r{i//4}' — no salt for the first four rows), mod
  ``width`` (see ``cms_bucket``), so an external engine (the DuckDB
  oracle) reproduces every counter and every estimate byte-for-byte
  from one digest per key per four rows.

Scale shape: the build explodes each input row into ``depth`` (row,
bucket) pairs, but the hash aggregate collapses them map-side to at
most depth×width rows per partition — the shuffle carries bounded
sketch fragments, never the key stream.  Estimation broadcasts the
(≤ depth×width row) sketch to the keys side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(
    key: Column, i: int, width: int, hash_family: str = "md5"
) -> Column:
    """Row-``i`` bucket of ``key``.

    ``md5`` (default): the i-th 32-bit hex chunk of md5(key) (one
    digest yields four independent row hashes; rows beyond 4 salt the
    key with a round tag), mod ``width`` — non-negative, reproducible
    in any engine with md5 and hex parsing (the oracle/audit family),
    and only ceil(depth/4) digests per key instead of depth.
    ``xxhash64``: one seeded 64-bit hash — cheaper still, Spark-private
    bits (the 100 TB build path; use it when no external engine needs
    to re-derive the buckets).  A sketch is only meaningful against
    estimates from the SAME family.
    """
    if hash_family == "md5":
        round_, chunk = divmod(i, 4)
        src = key.cast("string")
        if round_ > 0:
            src = F.concat(src, F.lit(f"#r{round_}"))
        h = F.conv(
            F.substring(F.md5(src.cast("binary")), 1 + 8 * chunk, 8), 16, 10
        ).cast("long")
        return h % width
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(width))
    raise ValueError(f"unknown hash_family {hash_family!r} (md5 | xxhash64)")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    weight_col: str | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` as a sparse
    (row int, bucket bigint, cnt bigint) DataFrame (absent buckets are
    zero).  ``weight_col`` aggregates a measure instead of occurrence
    counts (e.g. bytes per domain).  NULL keys are skipped, matching
    count(col) semantics."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth ({depth}) and width ({width}) must be >= 1")
    key = F.col(key_col)
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                cms_bucket(key, i, width, hash_family).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(pairs).alias("rb"), w.alias("_w"))
        .groupBy(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME depth/width: union + sum.
    Counter-wise addition is exact (no information loss relative to
    building once over the concatenated inputs) — the property that
    lets per-shard / per-day sketches roll up without rescanning."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    u = reduce(DataFrame.unionAll, sketches)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    hash_family: str = "md5",
) -> DataFrame:
    """Point-query estimates for every row of ``keys``: min over the
    ``depth`` rows of that key's counter (0 if a bucket is absent —
    the sketch is sparse).  Returns ``keys``' columns plus ``est``.

    The sketch side is ≤ depth×width rows by construction — broadcast
    it so the keys side (possibly corpus-sized) never shuffles.
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                cms_bucket(key, i, width, hash_family).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    exploded = keys.select(*keys.columns, F.explode(pairs).alias("rb")).select(
        *keys.columns,
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    )
    joined = exploded.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    return joined.groupBy(*keys.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 8192,
    hash_family: str = "md5",
) -> DataFrame:
    """Top-``k`` keys by sketch estimate: build the sketch, estimate
    every distinct key, TakeOrdered the top k (est desc, key asc
    tiebreak).  The distinct-key pass is the candidate enumerator; in a
    streaming/rollup setting the sketch would instead be probed with an
    externally-tracked candidate set, which is why build/estimate stay
    separate functions.

    Plan shape: heavy-hitter enumeration needs a distinct-keys shuffle
    anyway, so the per-key counts ride it for free (groupBy count
    instead of distinct — identical shuffle, map-side combined) and the
    sketch is then a WEIGHTED build over the distinct keys: each key is
    hashed once, not once per occurrence (measured ~3× faster at sf0.1
    where suppkey repeats 60×; identical counters — counter addition is
    commutative).  ``cms_build`` keeps the unweighted per-row form for
    sketch-only pipelines where a distinct-key shuffle is NOT otherwise
    paid and the build's own shuffle must stay bounded at depth×width."""
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").alias("_occ"))
    )
    sketch = cms_build(
        counts, key_col, depth, width, weight_col="_occ",
        hash_family=hash_family,
    )
    est = cms_estimate(
        sketch, counts.select(key_col), key_col, depth, width, hash_family
    )
    return est.orderBy(F.col("est").desc(), F.col(key_col)).limit(k)


# ---------------------------------------------------------------------------
# histogram quantile sketch (the quantile member of the mergeable family:
# HLL = distinct, CMS = frequency, histogram = distribution)
# ---------------------------------------------------------------------------

def histogram_build(
    df: DataFrame, value_col: str, bin_width: float
) -> DataFrame:
    """Fixed-width histogram state over ``value_col``: a sparse
    (bin bigint, cnt bigint) DataFrame with bin = floor(value /
    bin_width).  Deterministic binning makes it engine-portable
    (DuckDB reproduces every counter), and counts are decomposable, so
    shard/day histograms merge by union+sum exactly like CMS sketches.
    The shuffle carries ≤ |distinct bins| rows after map-side partials
    — at 100 TB the state is range/bin_width counters, not the data.
    NULLs are skipped (count(col) semantics)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .groupBy(F.floor(v / F.lit(bin_width)).alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def histogram_merge(*hists: DataFrame) -> DataFrame:
    """Union+sum of histogram states with the SAME bin_width — exact."""
    if not hists:
        raise ValueError("histogram_merge needs at least one histogram")
    u = reduce(DataFrame.unionAll, hists)
    return u.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame, quantiles: list[float], bin_width: float
) -> DataFrame:
    """Quantile estimates from a histogram state: for each q, the upper
    edge of the first bin whose cumulative count reaches q×N — error
    bounded by bin_width by construction (deterministic, so an
    external engine lands on identical values).  Returns (q, value).

    The cumulative-sum window runs over the BIN TABLE (range/bin_width
    rows), not the data — a single-partition sort of a bounded frame,
    same story as vocabulary ranking."""
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    parts = []
    for q in quantiles:
        parts.append(
            cum.filter(F.col("cum") >= F.ceil(F.col("total") * F.lit(q)))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                ((F.col("bin") + 1) * F.lit(bin_width)).alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# Bloom filter (membership) — the third mergeable sketch in the family
# ---------------------------------------------------------------------------

def bloom_build(
    df: DataFrame,
    key_col: str,
    m_words: int = 256,
    k: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a sparse (word int,
    bits bigint) DataFrame — the bitmap split into 32-bit words (words
    whose bits are all zero are absent).  m = 32·m_words bits, ``k``
    hash rows; false-positive rate ≈ (1 - e^{-kn/m})^k, zero false
    negatives.

    The classic 100 TB dedup PRE-filter: probe a new batch against the
    (tiny, broadcastable) filter of all history fingerprints and only
    the "might contain" survivors pay the exact anti-join against the
    full history store.  Completes the mergeable-sketch family (CMS =
    frequency, histogram = distribution, HLL = distinct, Bloom =
    membership).

    Bit positions come from the SAME engine-portable md5 chunk family
    as :func:`cms_bucket` (row i → chunk i of md5(key), mod m), so an
    external engine reproduces every word byte-for-byte — the catalog
    oracle rebuilds the filter in DuckDB and must land on identical
    bitmaps.  32-bit words keep every mask positive in a signed 64-bit
    lane (no sign-bit semantics to match across engines).

    Scale shape: each key explodes into k (word, mask) pairs that the
    hash aggregate collapses map-side to ≤ m_words rows per partition;
    the shuffle carries bounded bitmap fragments, never the key
    stream.  Merge = union + bit_or (:func:`bloom_merge`)."""
    if m_words < 1 or k < 1:
        raise ValueError(f"m_words ({m_words}) and k ({k}) must be >= 1")
    key = F.col(key_col)
    m_bits = 32 * m_words
    pairs = F.array(
        *[
            F.struct(
                F.floor(pos / 32).cast("int").alias("word"),
                (pos % 32).cast("int").alias("bit"),
            )
            for pos in (
                cms_bucket(key, i, m_bits, hash_family) for i in range(k)
            )
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(pairs).alias("wb"))
        .select(
            F.col("wb.word").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), wb.bit)").alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Bloom filters built with the SAME m_words/k/hash_family:
    union + bitwise OR per word — exactly the filter a single build
    over the concatenated inputs would produce."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = reduce(DataFrame.unionAll, sketches)
    return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    m_words: int = 256,
    k: int = 4,
    hash_family: str = "md5",
    result_col: str = "might_contain",
) -> DataFrame:
    """Append ``result_col``: True iff all k bits of ``key_col`` are
    set in ``sketch`` — never a false negative; a True may be a false
    positive at the filter's design rate.

    Scale shape: k broadcast hash joins of the (≤ m_words row) sketch
    against the probe side — zero shuffles of the probe stream and no
    per-key aggregation (each hash row is checked in its own joined
    column, then ANDed in one projection)."""
    if m_words < 1 or k < 1:
        raise ValueError(f"m_words ({m_words}) and k ({k}) must be >= 1")
    key = F.col(key_col)
    m_bits = 32 * m_words
    out = df
    checks = []
    for i in range(k):
        pos = cms_bucket(key, i, m_bits, hash_family)
        out = out.withColumn(
            f"_w{i}", F.floor(pos / 32).cast("int")
        ).withColumn(f"_b{i}", (pos % 32).cast("int"))
        side = sketch.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")
        )
        out = out.join(F.broadcast(side), on=f"_w{i}", how="left")
        checks.append(
            F.expr(
                f"(coalesce(_bits{i}, CAST(0 AS BIGINT)) & "
                f"shiftleft(CAST(1 AS BIGINT), _b{i})) != 0"
            )
        )
    cond = reduce(lambda a, b: a & b, checks)
    helper = [c for i in range(k) for c in (f"_w{i}", f"_b{i}", f"_bits{i}")]
    return out.withColumn(result_col, cond).drop(*helper)
