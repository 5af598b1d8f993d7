"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key) — the point-in-time lookup feature pipelines and
timeseries analytics need, which Spark has no native operator for.

BEYOND-REFERENCE (marked per SURVEY §2 conventions): the reference has
no as-of join either; this exists because a training-data/feature
pipeline at 100 TB joins events to slowly-changing state constantly.

Spark-first shape — the union-window formulation, NOT a per-row
subquery or a range-exploded join:

1. tag both sides and union them into one (key, ts, side) stream;
2. one window per key ordered by (ts, side) carries the right side's
   values forward with ``last(..., ignorenulls=True)``;
3. keep the left rows: each now holds the most recent right values.

Cost: ONE shuffle on the key plus an in-partition sort — the same
partitioning any per-key window uses, AQE-coalescible, no skew beyond
the key distribution itself.  The naive alternatives are O(|L|·|R|)
(theta join on ``r.ts <= l.ts`` is a range cross product) or per-row
subqueries (not expressible distributively at all).

Tie semantics: a right row at exactly the left row's timestamp MATCHES
(right sorts before left at equal ts) — the inclusive `>=` convention
DuckDB's native ASOF JOIN uses, which is what makes the oracle exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join (latest right row with ``right.ts <= left.ts``
    per key).  Returns every left row plus the matched right value
    columns (suffixed) and the matched right timestamp
    ``{right_ts}{suffix}``; unmatched left rows keep NULLs (left-join
    semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    val_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    out_vals = [f"{c}{suffix}" for c in val_cols] + [f"{right_ts}{suffix}"]

    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in val_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(
            f"{right_ts}{suffix}"
        ),
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in keys
            else F.col(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_asof_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in val_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in u.columns if c not in out_vals],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_vals],
    )
    return carried.filter(F.col("_side") == 1).drop("_asof_t", "_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval join: left rows matched to every right interval (same
    key) with ``start <= ts <= end`` — inclusive both ends.

    Spark plans a raw inequality join as BroadcastNestedLoop (a range
    cross product).  This formulation makes it an EQUI-join: each right
    interval explodes to the coarse time buckets it overlaps, the left
    side computes its single bucket, both equi-join on (key, bucket),
    and the exact BETWEEN predicate filters residuals.  Cost: one hash
    shuffle on (key, bucket) + interval rows duplicated
    ``interval_len / bucket_width`` times — pick ``bucket_width`` near
    the TYPICAL interval length so the duplication factor stays O(1).
    Defaults to the right side's average interval length (one cheap agg)
    when not given; pass it explicitly in pipelines where the input
    statistics are known.

    Timestamps are treated as numeric (cast to long internally); works
    for epoch seconds/millis or any monotone numeric key.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lt = F.col(left_ts).cast("long")
    rs, re_ = F.col(right_start).cast("long"), F.col(right_end).cast("long")
    if bucket_width is None:
        row = right.select(
            F.avg(re_ - rs).alias("w")
        ).first()
        bucket_width = max(int(row.w or 1), 1)
    r_bucketed = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(rs / bucket_width), F.floor(re_ / bucket_width)
            )
        ),
    )
    l_bucketed = left.withColumn("_bkt", F.floor(lt / bucket_width))
    joined = l_bucketed.join(r_bucketed, on=[*keys, "_bkt"]).filter(
        (lt >= rs) & (lt <= re_)
    )
    return joined.drop("_bkt")
