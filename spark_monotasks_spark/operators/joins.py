"""Join operators with the reference's semantics (SURVEY §2.3).

Reference physical joins (sql/core/.../execution/joins/, 997 LoC):
ShuffledHashJoin.scala:33, BroadcastHashJoin.scala:39,
HashOuterJoin.scala:39, LeftSemiJoinHash.scala:32,
BroadcastLeftSemiJoinHash.scala:31, LeftSemiJoinBNL.scala:32,
CartesianProduct.scala:30, BroadcastNestedLoopJoin.scala:32; join types
from catalyst/plans/joinTypes.scala:32-40 (Inner/LeftOuter/RightOuter/
FullOuter/LeftSemi).

We declare the join logically and let Catalyst + AQE pick the physical
strategy (broadcast below ``autoBroadcastJoinThreshold``, else sort-merge
or shuffled-hash; AQE can switch at runtime and split skewed partitions).
``broadcast=True`` forces the BroadcastHashJoin path, matching the
reference's explicit small-side broadcast.

At 100 TB scale:
- always broadcast bounded dims (region/nation; see tables.BROADCAST_DIMS)
- equi-joins shuffle on the join key — pre-`repartition` or bucket both
  sides on the key when the same key is joined repeatedly
- skewed fact-fact joins rely on AQE skew-join (enabled in session.py);
  `salted_join` below is the explicit fallback for pathological skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_JOIN_TYPES = {
    "inner": "inner",  # ShuffledHashJoin / BroadcastHashJoin
    "left": "left",  # HashOuterJoin (LeftOuter)
    "left_outer": "left",
    "right": "right",  # HashOuterJoin (RightOuter)
    "right_outer": "right",
    "full": "full",  # HashOuterJoin (FullOuter)
    "full_outer": "full",
    "left_semi": "left_semi",  # LeftSemiJoinHash / BNL
    "semi": "left_semi",
    # anti is not a reference join TYPE (achieved via EXCEPT/subtract —
    # SURVEY §2.3 "Not present"); exposed because setops.except_reference
    # is implemented on top of it.
    "left_anti": "left_anti",
    "anti": "left_anti",
    "cross": "cross",  # CartesianProduct.scala:30
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column | None = None,
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """Equi/theta join with optional explicit broadcast of the right side."""
    how = _JOIN_TYPES[how.lower()]
    r = F.broadcast(right) if broadcast else right
    if how == "cross" and on is None:
        return left.crossJoin(r)
    return left.join(r, on=on, how=how)


def broadcast_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """BroadcastHashJoin (joins/BroadcastHashJoin.scala:39): right side is
    built into a hash relation on each executor; no shuffle of the left."""
    return join(left, right, on, how, broadcast=True)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """LeftSemiJoinHash (joins/LeftSemiJoinHash.scala:32): EXISTS — keeps
    left rows with ≥1 match, right columns dropped, no duplication."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS.  The reference reached this via RDD.subtract
    (SubtractedRDD.scala:143-145); left_anti is the declarative twin."""
    return left.join(right, on=on, how="left_anti")


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """CartesianProduct (joins/CartesianProduct.scala:30).  O(|L|·|R|) —
    only ever sane when one side is tiny; Catalyst plans BNLJ when a
    condition is attached afterwards."""
    return left.crossJoin(right)


def theta_join(left: DataFrame, right: DataFrame, condition: Column, how: str = "inner") -> DataFrame:
    """Non-equi join (reference: BroadcastNestedLoopJoin.scala:32 /
    CartesianProduct + filter, SparkStrategies.scala:188)."""
    return left.join(right, on=condition, how=_JOIN_TYPES[how.lower()])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the small/right side into
    ``salt_buckets`` copies and salt the left key randomly, so one hot key
    spreads over N shuffle partitions.  Beyond-reference scale tool — AQE
    skew-join handles moderate skew automatically; use this for a single
    pathological key at the 100 TB tier.

    Only inner/left are valid: the exploded right copies are
    indistinguishable from real rows to right/full outer semantics (the
    salt copies a left row did NOT draw would null-extend as spurious
    output rows), so those join types are rejected.
    """
    if _JOIN_TYPES[how.lower()] not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left only, not {how!r}: exploded "
            "salt copies would surface as spurious rows under right/full outer"
        )
    salt = F.floor(F.rand(seed=42) * salt_buckets).cast("int")
    lsalted = left.withColumn("__salt", salt)
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = lsalted.join(rsalted, on=[on, "__salt"], how=how)
    return out.drop("__salt")
