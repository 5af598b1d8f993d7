"""Aggregation operators (SURVEY §2.4) + grouping analytics (§2.4 row 7).

Reference: execution/Aggregate.scala:42 (hash agg, partial+final via
SplitEvaluation aggregates.scala:52), GeneratedAggregate.scala:46
(codegen subset), expressions/aggregates.scala:93-451 (Min/Max/Count/
CountDistinct/ApproxCountDistinct(HLL, rsd=0.05)/Average/Sum/SumDistinct/
First/Last), GroupedData.scala:116-220, grouping sets via Expand
(Analyzer.scala:81 → execution/Expand.scala:36).

Modern Spark does partial (map-side) + final aggregation automatically
inside whole-stage codegen — at scale this is the map-side combine that
keeps the shuffle proportional to |groups|, not |rows|.  Nothing here
drops to Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F

#: reference ApproxCountDistinct default relativeSD (aggregates.scala:275)
REFERENCE_APPROX_RSD = 0.05


def group_agg(
    df: DataFrame, keys: Sequence[str | Column], aggs: Sequence[Column]
) -> DataFrame:
    """groupBy().agg() — Aggregate.scala:42.  Partial/final split is
    Catalyst's job; requires ClusteredDistribution on keys → one shuffle."""
    return df.groupBy(*keys).agg(*aggs)


def grouped(df: DataFrame, *keys: str | Column) -> GroupedData:
    """GroupedData parity (GroupedData.scala:169-217 count/mean/max/avg/
    min/sum are methods on the returned object, same as reference)."""
    return df.groupBy(*keys)


def approx_count_distinct(col: str | Column, rsd: float = REFERENCE_APPROX_RSD) -> Column:
    """ApproxCountDistinct (aggregates.scala:275).  Reference used
    clearspring HyperLogLog; Spark uses HLL++ — estimates differ, so
    correctness checks compare with rsd tolerance, not hash equality
    (SURVEY §7.4.7)."""
    return F.approx_count_distinct(col, rsd)


def distinct(df: DataFrame) -> DataFrame:
    """SELECT DISTINCT (L basicOperators.scala:276, P :170 — HashSet
    partial+final). Spark plans it as a group-by on all columns."""
    return df.distinct()


def drop_duplicates(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    return df.dropDuplicates(subset)


def cube(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Cube (L basicOperators.scala:231) → Expand with all 2^k grouping
    sets + grouping_id bitmask (Analyzer.scala:81)."""
    return df.cube(*keys).agg(F.grouping_id().alias("grouping_id"), *aggs)


def rollup(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Rollup (L basicOperators.scala:250) — k+1 prefix grouping sets."""
    return df.rollup(*keys).agg(F.grouping_id().alias("grouping_id"), *aggs)


def grouping_sets_sql(
    table: str, keys: Sequence[str], sets: Sequence[Sequence[str]], agg_sql: str
) -> str:
    """Build a GROUP BY ... GROUPING SETS query (HiveQl.scala:738 parsed
    TOK_GROUPING_SETS; we emit standard SQL that modern Spark and the
    DuckDB oracle both accept)."""
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    key_list = ", ".join(keys)
    return (
        f"SELECT {key_list}, {agg_sql} FROM {table} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def describe(df: DataFrame, *cols: str) -> DataFrame:
    """DataFrame.describe (DataFrame.scala:788): count/mean/stddev/min/max."""
    return df.describe(*cols)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    spec: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-resilient two-stage aggregation: the aggregation sibling of
    ``joins.salted_join`` for keys so hot one reducer would own the
    whole group.

    ``spec`` maps output name → ("sum"|"count"|"min"|"max"|"avg", col).
    Stage 1 aggregates on (keys, salt) — the hot key's rows split over
    ``salt_buckets`` reducers — stage 2 merges the partials per key.
    Only decomposable aggregates are offered (avg merges as sum/count);
    that restriction is what makes the rewrite exact.

    Salt is ``xxhash64(struct(*)) % buckets`` — deterministic per row
    content, so shuffle-retry recomputation can't double-count (a
    ``rand()`` salt can, under partial stage retries).  Note AQE's
    skew handling covers JOINS only; skewed aggregation keys still need
    explicit salting.  Two shuffles instead of one — pay it only when a
    key is hot enough to swamp a task.
    """
    allowed = {"sum", "count", "min", "max", "avg"}
    bad = {f for f, (fn, _) in spec.items() if fn not in allowed}
    if bad:
        raise ValueError(
            f"non-decomposable aggregate(s) {bad}: salted_agg supports {allowed}"
        )
    salt = F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(salt_buckets))
    partials = []
    merges = []
    for out, (fn, col) in spec.items():
        if fn == "count":
            partials.append(F.count(col).alias(f"_p_{out}"))
            merges.append(F.sum(f"_p_{out}").cast("long").alias(out))
        elif fn == "sum":
            partials.append(F.sum(col).alias(f"_p_{out}"))
            merges.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partials.append(F.min(col).alias(f"_p_{out}"))
            merges.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partials.append(F.max(col).alias(f"_p_{out}"))
            merges.append(F.max(f"_p_{out}").alias(out))
        else:  # avg: decompose into sum + count, merge as ratio
            partials.append(F.sum(col).alias(f"_ps_{out}"))
            partials.append(F.count(col).alias(f"_pc_{out}"))
            merges.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out)
            )
    stage1 = df.groupBy(*keys, salt.alias("_salt")).agg(*partials)
    return stage1.groupBy(*keys).agg(*merges)
