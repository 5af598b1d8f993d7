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


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    on: list[str],
    tracked: list[str],
    ts_col: str = "effective_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension Type 2: apply an update batch to a
    versioned dimension, closing superseded versions instead of
    overwriting them (the historical completion of ``merge_upsert`` —
    reference write surface stops at overwrite,
    hive/execution/InsertIntoHiveTable.scala).

    ``dim`` carries ``on + tracked + [from_col, to_col, current_col]``;
    ``updates`` carries ``on + tracked + [ts_col]``.  Per key:

    - tracked attributes unchanged (null-safe) → NO new version (no-op
      updates are filtered out, the usual SCD2 idempotency guarantee);
    - changed → the current row closes (``to_col`` = update timestamp,
      ``current_col`` = false) and a new open version inserts;
    - brand-new key → one open version inserts.

    Multiple updates for one key collapse to the latest ``ts_col``
    first (window over the SMALL updates side only); exact-``ts_col``
    ties break deterministically by the tracked attribute values
    (descending, nulls last), so the surviving version never depends on
    partition order.  OUT-OF-ORDER updates — ``ts_col`` strictly before
    the current version's ``valid_from`` — are dropped as stale no-ops
    rather than applied: applying one would close the current version
    with ``valid_to < valid_from`` (inverted history).  Late-arriving
    backfill therefore needs a rebuild from the full update log, not
    this incremental apply; the invariant ``valid_from <= valid_to``
    holds on every closed row this function emits.  Scale shape: the
    dimension is touched by one broadcast join (change detection
    against current rows) + one broadcast anti-join + union — the
    100 TB dimension never shuffles when the batch broadcasts."""
    w = Window.partitionBy(*on).orderBy(
        F.col(ts_col).desc(),
        *[F.col(c).desc_nulls_last() for c in tracked],
    )
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    current = dim.filter(F.col(current_col))
    # Change detection joins the SMALL side into the BIG side so the
    # dimension never shuffles: broadcast the update batch against the
    # current rows, not the reverse.
    upd_b = F.broadcast(latest) if broadcast_updates else latest
    matched = current.join(
        upd_b.select(
            *on, ts_col, *[F.col(c).alias(f"_new_{c}") for c in tracked]
        ),
        on=on,
        how="inner",
    )
    cond = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.col(f"_new_{c}"))
        cond = eq if cond is None else (cond & eq)
    # stale guard: an update older than the open version would invert
    # history (valid_to < valid_from) — treat it as a no-op instead
    changed = matched.filter(~cond & (F.col(ts_col) >= F.col(from_col)))

    # Rows of `current` being superseded, closed at the update ts.
    closed = changed.select(
        *on,
        *tracked,
        F.col(from_col),
        F.col(ts_col).alias(to_col),
        F.lit(False).alias(current_col),
    )
    # New open versions: changed keys (new attribute values) + keys with
    # no current row at all.
    new_keys = latest.join(
        F.broadcast(current.select(*on)) if broadcast_updates else current.select(*on),
        on=on,
        how="left_anti",
    )
    opened = (
        changed.select(
            *on, *[F.col(f"_new_{c}").alias(c) for c in tracked], ts_col
        )
        .unionByName(new_keys.select(*on, *tracked, ts_col))
        .select(
            *on,
            *tracked,
            F.col(ts_col).alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
            F.lit(True).alias(current_col),
        )
    )
    # Untouched dim rows: history rows always survive; current rows
    # survive unless their key actually changed.
    touched = changed.select(*on)
    if broadcast_updates:
        touched = F.broadcast(touched)
    untouched_current = current.join(touched, on=on, how="left_anti")
    history = dim.filter(~F.col(current_col))
    cols = [*on, *tracked, from_col, to_col, current_col]
    return (
        history.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed)
        .unionByName(opened)
    )


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
