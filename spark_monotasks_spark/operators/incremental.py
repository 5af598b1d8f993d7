"""Incremental aggregate maintenance: keep a per-key aggregate STATE
table (count/sum/min/max — the decomposable partials) and fold new data
in without rescanning history.

This is the batch analogue of what the reference's StateDStream does
for streams (StateDStream.scala:29 cogroups prior state with the new
batch): at 100 TB you never re-aggregate the full fact table to refresh
a rollup — you aggregate the DELTA (tiny) and merge state-with-state on
the keys.  Cost per refresh is O(delta) + one shuffle of the state
table's keys; the history is never read again.

Everything here is plain decomposable algebra (the same partial/final
split HashAggregate uses inside a single query — SURVEY §2.4 row 26 —
lifted to a cross-run table), so results are EXACTLY equal to a full
recompute, which is what the catalog oracle asserts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state columns maintained per measure m: m_cnt, m_sum, m_min, m_max.
_SUFFIXES = ("cnt", "sum", "min", "max")


def aggregate_state(
    df: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Aggregate a batch of raw rows into per-key partial state."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}_cnt"),
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_states(
    state_a: DataFrame, state_b: DataFrame, keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Merge two state tables key-wise (union + re-partial): counts and
    sums add, mins/maxs combine — the HashAggregate merge step as a
    standalone operator.  Keys present in only one side pass through
    (sum/count of the absent side contribute nothing)."""
    merged = state_a.unionByName(state_b)
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return merged.groupBy(*keys).agg(*aggs)


def incremental_refresh(
    state: DataFrame, delta: DataFrame, keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Fold a raw delta batch into an existing state table: aggregate
    the delta (O(delta)), then state-merge.  History is never
    rescanned."""
    return merge_aggregate_states(
        state, aggregate_state(delta, keys, measures), keys, measures
    )


def finalize_state(
    state: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Materialize user-facing aggregates from state: count, sum, avg
    (= sum/cnt, NULL for empty), min, max per measure."""
    cols = [F.col(k) for k in keys]
    for m in measures:
        cnt = F.col(f"{m}_cnt")
        cols += [
            cnt.alias(f"{m}_count"),
            F.col(f"{m}_sum").alias(f"{m}_sum"),
            F.when(cnt > 0, F.col(f"{m}_sum") / cnt).alias(f"{m}_avg"),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
        ]
    return state.select(*cols)
