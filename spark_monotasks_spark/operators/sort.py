"""Sorts / limits / top-k (SURVEY §2.6).

Reference: Sort (P basicOperators.scala:144 — per-partition in-memory
sort; global = RangePartitioning Exchange, Exchange.scala:65; NO spill,
the fork removed ExternalSorter), Limit (:92 — partition-local limit,
single-partition shuffle, final limit), TakeOrdered (:121 —
BoundedPriorityQueue per partition, planned from Limit(Sort) pattern
SparkStrategies.scala:198-202), SORT BY / DISTRIBUTE BY / CLUSTER BY
(HiveQl.scala:611-613).

Modern Spark: orderBy = sampled range partitioning + spillable external
sort (strictly more robust than the reference); ``orderBy().limit(k)`` is
planned as TakeOrderedAndProject — the same bounded-priority-queue trick,
which at scale never materializes a global sort.  Null ordering default
matches the reference (nulls first ascending — SortOrder.scala:32).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame


def order_by(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Global sort (Sort + RangePartitioning Exchange)."""
    return df.orderBy(*cols)


def sort_within_partitions(df: DataFrame, *cols: str | Column) -> DataFrame:
    """SORT BY (partition-local sort, no exchange — SortPartitions)."""
    return df.sortWithinPartitions(*cols)


def distribute_by(df: DataFrame, num: int, *cols: str | Column) -> DataFrame:
    """DISTRIBUTE BY — hash repartition on expressions (L Repartition)."""
    return df.repartition(num, *cols)


def cluster_by(df: DataFrame, num: int, *cols: str | Column) -> DataFrame:
    """CLUSTER BY = DISTRIBUTE BY + SORT BY on the same columns."""
    return df.repartition(num, *cols).sortWithinPartitions(*cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    """Limit (basicOperators.scala:92): local limit → single-partition
    exchange of ≤n rows per partition → global limit."""
    return df.limit(n)


def top_k(df: DataFrame, k: int, *order_cols: str | Column) -> DataFrame:
    """TakeOrdered (basicOperators.scala:121).  Catalyst plans
    TakeOrderedAndProject: per-partition bounded priority queue of size k,
    merge on driver — O(n log k) and shuffle of only k·partitions rows.
    Callers should include a unique tiebreaker column for determinism."""
    return df.orderBy(*order_cols).limit(k)


def coalesce(df: DataFrame, n: int) -> DataFrame:
    """RDD.coalesce (RDD.scala:601) — narrow (no shuffle) partition merge."""
    return df.coalesce(n)


def repartition(df: DataFrame, n: int, *cols: str | Column) -> DataFrame:
    """RDD.repartition (RDD.scala:577) — full shuffle to n partitions."""
    return df.repartition(n, *cols) if cols else df.repartition(n)


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tiebreak: str,
) -> DataFrame:
    """Distinct 2-D Pareto frontier (skyline operator, Börzsönyi 2001):
    rows for which NO other row is >= in both ``x_col`` and ``y_col``
    and > in one — the multi-criteria selection primitive ("longest AND
    highest-quality documents") SQL engines ship as SKYLINE OF and
    Spark lacks.

    Exact sort-based decomposition instead of the quadratic NOT-EXISTS
    self-join: scanning in (x DESC, y DESC) order, a row is on the
    frontier iff its y strictly exceeds the EXCLUSIVE running max of y
    (every earlier row has x' >= x, so any earlier y' >= y dominates;
    later rows never can).  Exact-duplicate (x, y) points collapse to
    one representative — this is the DISTINCT frontier.  The running
    max is the two-pass distributed shape (operators.indexing.
    running_max): one range exchange, never a one-task window — the
    same scale posture as zip_with_index.

    Output: the surviving rows of ``df`` (all original columns).
    """
    from pyspark.sql import functions as F

    from spark_monotasks_spark.operators.indexing import running_max

    ordered = running_max(
        df,
        y_col,
        [F.col(x_col).desc(), F.col(y_col).desc(), F.col(tiebreak)],
        total_col="_prefmax",
        exclusive=True,
    )
    return ordered.filter(
        F.col("_prefmax").isNull() | (F.col(y_col) > F.col("_prefmax"))
    ).drop("_prefmax")
