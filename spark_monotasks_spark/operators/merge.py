"""Merge / upsert / CDC-apply — the table-maintenance operators a
warehouse user reaches for after INSERT (reference analogy:
hive/execution/InsertIntoHiveTable.scala is append/overwrite only; the
upsert shape is the modern completion of that surface).

Spark-first design: MERGE INTO needs a v2 row-level-ops catalog, so on
plain parquet relations the canonical scalable form is join algebra —

- ``merge_upsert``: changed keys leave via one hash anti-join (broadcast
  when the update batch is small — the common CDC case), then one
  union.  Cost ≈ one scan of base + one shuffle/broadcast of the
  UPDATES (the small side); the base never shuffles when the update
  batch broadcasts.
- ``apply_cdc``: a change LOG (op ∈ {I,U,D}, monotonically increasing
  seq) first collapses to latest-change-per-key — a window over the
  (small) log only, never over base — then deletes filter and upserts
  merge as above.

At 100 TB the base-side work is a linear scan either way; everything
keyed shuffles only the change batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    on: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Upsert: rows from ``updates`` replace same-key rows in ``base``;
    unmatched update rows insert.  Schemas must match by name.

    ``broadcast_updates=True`` (the common CDC case: batch ≪ base)
    pins a broadcast anti-join so base never shuffles; pass False for
    backfill-sized update sets and let AQE pick a shuffled hash join."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    keys = updates.select(*on)
    if broadcast_updates:
        keys = F.broadcast(keys)
    keep = base.join(keys, on=on, how="left_anti")
    return keep.unionByName(updates)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    on: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a CDC log to a snapshot: per key, the highest-``seq``
    change wins; 'D' deletes the key, 'I'/'U' upsert the row.

    The window runs over the change log only (small), partitioned by
    key — base is touched by exactly one anti-join + union."""
    w = Window.partitionBy(*on).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    touched = latest.select(*on)
    if broadcast_changes:
        touched = F.broadcast(touched)
    keep = base.join(touched, on=on, how="left_anti")
    return keep.unionByName(upserts)
