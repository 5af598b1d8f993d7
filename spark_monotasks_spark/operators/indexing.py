"""Distributed contiguous row indexing — the RDD.zipWithIndex shape
(reference core/rdd/RDD.scala:1371) re-expressed JVM-side.

The reference computes zipWithIndex in two passes: a count per
partition, then a cumulative-offset broadcast added to each row's
partition-local position.  The naive DataFrame translation —
``row_number() OVER (ORDER BY key)`` with no PARTITION BY — shuffles
the ENTIRE input to a single task (Catalyst plans an un-partitioned
window as a one-partition Exchange + Sort), which is a straight
scale-killer at 100 TB.  This module keeps the reference's two-pass
shape instead, fully distributed and fully JVM-side:

1. (ordered form) range-repartition + sort-within-partitions on the
   order keys, so partition *i*'s keys all precede partition *i+1*'s
   and within-partition order is deterministic;
2. ``monotonically_increasing_id()`` — documented public behavior:
   partition id in the upper bits, a contiguous 0-based record number
   within each partition in the lower 33 bits — decomposed with
   shift/mask into ``(_pid, _lrank)`` without any Python round-trip;
3. a per-partition count aggregate (map-side combine collapses each
   task to ONE row, so the shuffle moves ≤ num_partitions rows);
4. a bounded cumulative-sum window over those ≤ num_partitions count
   rows (the one place an un-partitioned window is legitimate: its
   input is an already-collapsed aggregate, never a raw scan — the
   catalog-wide plan gate in tests/test_plans.py enforces exactly
   this distinction);
5. a broadcast join of the offsets back onto the big side —
   ``idx = offset + _lrank``.

Total data movement: ONE range exchange of the input (ordered form)
or ZERO exchanges of the input (partition-order form); everything
else ships ≤ num_partitions rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: monotonically_increasing_id puts the within-partition record number
#: in the low 33 bits (MonotonicallyIncreasingID.scala — documented
#: public contract of the expression).
_RECORD_BITS = 33
_RECORD_MASK = (1 << _RECORD_BITS) - 1


def _with_partition_position(df: DataFrame) -> DataFrame:
    """Attach (_pid, _lrank): partition id and contiguous 0-based
    position within the partition, decomposed from
    monotonically_increasing_id — no shuffle, no Python."""
    mid = F.monotonically_increasing_id()
    return df.withColumns(
        {
            "_pid": F.shiftrightunsigned(mid, _RECORD_BITS),
            "_lrank": mid.bitwiseAND(F.lit(_RECORD_MASK)),
        }
    )


def _add_offsets(positioned: DataFrame, index_col: str) -> DataFrame:
    """counts → cumulative offsets → broadcast join → offset + _lrank."""
    counts = positioned.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # bounded input: one row per partition (an aggregate, never a raw
    # scan), so the un-partitioned running-sum window is O(partitions)
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off")
    )
    out_cols = [c for c in positioned.columns if c not in ("_pid", "_lrank")]
    return positioned.join(F.broadcast(offsets), on="_pid").select(
        *out_cols,
        (F.col("_off") + F.col("_lrank")).cast("long").alias(index_col),
    )


def zip_with_index(
    df: DataFrame,
    order_cols: Sequence[str | Column] | None = None,
    index_col: str = "idx",
) -> DataFrame:
    """Contiguous 0-based row index as a new column, distributed.

    ``order_cols=None`` — RDD.zipWithIndex parity: the index reflects
    the current partition layout (partition-major, arrival order
    within a partition); zero exchanges of the input.  Like the RDD
    form, the assignment is only deterministic if the upstream
    partitioning/order is.

    ``order_cols`` given — total-order index: equals
    ``row_number() OVER (ORDER BY order_cols) - 1`` but planned as a
    sampled range Exchange + partition-local sort (Spark's global-sort
    machinery, skew-robust) instead of a one-task global window.
    Deterministic when the keys are unique; ties are broken
    arbitrarily-but-consistently within a run, exactly like
    ``row_number`` itself.
    """
    if order_cols:
        # explicit partition count: AQE never re-coalesces a
        # user-specified repartition, so the counts branch and the row
        # branch of the plan are guaranteed the same partitioning even
        # if the exchange were recomputed instead of reused
        spark = df.sparkSession
        try:
            n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            n = spark.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, *order_cols).sortWithinPartitions(
            *order_cols
        )
    # PIN the positioned rows before deriving offsets: the offsets
    # branch and the row branch are separate physical jobs, and when
    # the upstream's in-partition order is nondeterministic (hash
    # aggregate / join output feeding the range sampler), the two jobs
    # can sample DIFFERENT range boundaries — offsets computed for one
    # layout applied to another silently corrupts every index past the
    # first diverging partition.  A lazy localCheckpoint materializes
    # the layout once (at the offsets job) and the row job re-reads the
    # same stored partitions.  Same single-materialization price the
    # reference pays: its zipWithIndex runs a count job over the RDD
    # first (core/rdd/RDD.scala:1371).
    pos = _with_partition_position(df).localCheckpoint(eager=False)
    return _add_offsets(pos, index_col)


def running_total(
    df: DataFrame,
    value_col: str | Column | Sequence[str | Column],
    order_cols: Sequence[str | Column],
    total_col: str | Sequence[str] = "running_total",
) -> DataFrame:
    """Distributed GLOBAL running sum: equals ``sum(value) OVER (ORDER
    BY order_cols ROWS UNBOUNDED PRECEDING)`` but never plans the
    one-task un-partitioned window — the same two-pass decomposition as
    :func:`zip_with_index`, generalized from counts to sums:

    1. range-repartition + sort on the order keys (the ONE exchange of
       the input);
    2. per-partition value sums collapse map-side to ≤ num_partitions
       rows; their cumulative offsets run through the bounded
       aggregate-input window that the catalog-wide plan gate permits;
    3. offsets broadcast back; the within-partition prefix sum is a
       window PARTITIONED by the range-partition id — Catalyst inserts
       a hash exchange on ``_pid`` for it, which is why callers should
       hand this function a NARROW projection (id + keys + value) and
       join survivors back, never a wide row with the payload (see
       pipeline.text.select_to_token_budget).

    Ties in ``order_cols`` get arbitrary-but-consistent relative order
    (exactly like ``row_number``); pass a unique tiebreaker for a
    deterministic result.

    ``value_col``/``total_col`` accept lists: several running sums over
    the SAME ordering share the one range exchange, the one pinned
    layout, and the one ``_pid`` window (a two-sample KS statistic
    needs both samples' cumulative counts — calling twice would double
    every shuffle)."""
    if isinstance(value_col, (str, Column)):
        value_cols: list[str | Column] = [value_col]
        total_cols = [total_col if isinstance(total_col, str) else "running_total"]
    else:
        value_cols = list(value_col)
        assert not isinstance(total_col, str), (
            "multiple value_cols need a matching list of total_cols"
        )
        total_cols = list(total_col)
        assert len(total_cols) == len(value_cols)
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # pinned for the same two-job layout-divergence reason as
    # zip_with_index (see comment there): offsets derived from one
    # sampled range layout must be applied to THAT layout
    pos = _with_partition_position(ranged).localCheckpoint(eager=False)
    sums = pos.groupBy("_pid").agg(
        *[F.sum(v).alias(f"_psum{i}") for i, v in enumerate(value_cols)]
    )
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_psum{i}").over(w), F.lit(0)).alias(f"_off{i}")
            for i in range(len(value_cols))
        ],
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy("_lrank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_cols = [c for c in df.columns]
    joined = pos.join(F.broadcast(offsets), on="_pid")
    return joined.select(
        *out_cols,
        *[
            (F.col(f"_off{i}") + F.sum(v).over(wloc)).alias(t)
            for i, (v, t) in enumerate(zip(value_cols, total_cols))
        ],
    )


def running_max(
    df: DataFrame,
    value_col: str | Column,
    order_cols: Sequence[str | Column],
    total_col: str = "running_max",
    exclusive: bool = False,
) -> DataFrame:
    """Distributed GLOBAL running maximum — ``max(value) OVER (ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING [AND -1])`` without the
    one-task un-partitioned window.  Same two-pass decomposition as
    :func:`running_total` (max is associative, so per-partition maxima
    compose through the bounded offset window exactly like sums):

    1. range-repartition + sort on the order keys (the one exchange);
    2. per-partition max collapses map-side to ≤ num_partitions rows;
       the EXCLUSIVE cumulative max over those rows (strictly earlier
       partitions) is the bounded-aggregate window the plan gate
       permits;
    3. offsets broadcast back; ``greatest`` of the partition offset and
       the within-partition prefix max.

    ``exclusive=True`` returns the STRICT-prefix max (the value of all
    earlier rows only — NULL for the global first row), the form a
    skyline/Pareto scan needs.  Ties in ``order_cols`` follow
    row_number semantics — pass a unique tiebreaker.
    """
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # pinned for the same two-job layout-divergence reason as
    # zip_with_index: offsets derived from one sampled range layout
    # must be applied to THAT layout
    pos = _with_partition_position(ranged).localCheckpoint(eager=False)
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    maxes = pos.groupBy("_pid").agg(F.max(vc).alias("_pmax"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = maxes.select(
        "_pid", F.max("_pmax").over(w_off).alias("_off")
    )
    end = -1 if exclusive else 0
    wloc = (
        Window.partitionBy("_pid")
        .orderBy("_lrank")
        .rowsBetween(Window.unboundedPreceding, end)
    )
    out_cols = [c for c in df.columns]
    joined = pos.join(F.broadcast(offsets), on="_pid")
    local_max = F.max(vc).over(wloc)
    combined = (
        F.when(
            F.col("_off").isNull() & local_max.isNull(), F.lit(None)
        )
        .when(F.col("_off").isNull(), local_max)
        .when(local_max.isNull(), F.col("_off"))
        .otherwise(F.greatest(F.col("_off"), local_max))
    )
    return joined.select(*out_cols, combined.alias(total_col))
