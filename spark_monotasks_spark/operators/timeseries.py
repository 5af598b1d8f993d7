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
