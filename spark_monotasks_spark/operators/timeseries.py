"""Time-series regularization: resample an irregular event stream onto
a fixed grid with forward-fill — the gap-filling operator every
monitoring / feature-engineering pipeline needs and vanilla SQL lacks.

Scale shape (per key): the grid is `sequence()`-generated and exploded
— O(span/step) rows per key, never a cross join against a calendar
table; bucket aggregation and the forward-fill window both run on the
same key partitioning, so the whole operator costs one shuffle on
(key, bucket) plus one on key.  At 100 TB the output is bounded by
keys × buckets regardless of input event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per key: bucket observations to ``step_seconds``, build the full
    dense grid from the key's first to last bucket, and forward-fill
    buckets with no observation from the latest earlier value.

    Bucket value = the observation with the greatest (ts, tiebreak
    row order) in the bucket — "last write wins", deterministically.
    Output: (key, bucket_ts epoch-seconds, value, filled flag).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    step = int(step_seconds)
    bucketed = df.select(
        F.col(key_col).alias("key"),
        ((sec / step).cast("long") * step).alias("bucket_ts"),
        sec.alias("_sec"),
        F.col(value_col).alias("_val"),
    )
    w_last = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("_sec").desc(), F.col("_val").desc()
    )
    obs = (
        bucketed.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket_ts", F.col("_val").alias("obs_value"))
    )
    span = bucketed.groupBy("key").agg(
        F.min("bucket_ts").alias("_mn"), F.max("bucket_ts").alias("_mx")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step))
        ).alias("bucket_ts"),
    )
    joined = grid.join(obs, on=["key", "bucket_ts"], how="left")
    w_fill = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "key",
        "bucket_ts",
        F.last("obs_value", ignorenulls=True).over(w_fill).alias("value"),
        F.col("obs_value").isNull().alias("filled"),
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    bucket: str = "1 hour",
) -> DataFrame:
    """OHLC downsampling (the financial/metrics resampling staple):
    per key and time bucket — open (value at the earliest row), high,
    low, close (value at the latest row), n.

    Determinism: ties on the timestamp are broken by the value itself
    (rank on ``(ts, value)`` asc for open, desc for close), so the
    result is a pure function of the row SET — engine-reproducible,
    unlike bare first/last over an arbitrary partition order.

    Scale shape: ONE Exchange on (keys, bucket) serves both rank
    windows and the final aggregate (Catalyst reuses the
    partitioning); high/low/n fold into the same grouped pass."""
    b = F.window(F.col(ts_col), bucket).getField("start").alias("bucket")
    base = df.select(*keys, F.col(ts_col).alias("_ts"),
                     F.col(value_col).cast("double").alias("_v"), b)
    w_a = Window.partitionBy(*keys, "bucket").orderBy("_ts", "_v")
    w_d = Window.partitionBy(*keys, "bucket").orderBy(
        F.col("_ts").desc(), F.col("_v").desc()
    )
    ranked = base.select(
        *keys,
        "bucket",
        "_v",
        F.row_number().over(w_a).alias("_ra"),
        F.row_number().over(w_d).alias("_rd"),
    )
    return ranked.groupBy(*keys, "bucket").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("_v"))).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col("_v"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )
