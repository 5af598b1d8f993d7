"""Single-pass data-quality profiling — the constraint-suite shape a
training-data pipeline runs before trusting an ingest batch (Deequ's
"verification suite" idea re-expressed as one Spark aggregate; the
reference's stats surface stops at ANALYZE TABLE row/size counts,
hive/execution/commands.scala AnalyzeTable).

Design: ONE ``df.agg(...)`` computes every per-column measure
(non-null count, distinct count, min, max) plus the row count, so the
input is scanned exactly once with map-side partial aggregation; the
single 1-row result is then unpivoted driver-free via ``stack`` into
one row per profiled column with constraint verdicts attached.

Scale note: multiple exact COUNT(DISTINCT) in one aggregate plan via
Catalyst's Expand — the scan stays single-pass but rows multiply by the
number of distinct aggregates before the shuffle.  At 100 TB pass
``exact_distinct=False`` to use approx_count_distinct (HLL++, rsd
default 5%): no Expand, pure map-side sketch merge, at the cost of
approximate ``n_distinct`` / ``is_unique``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (numeric or castable-to-double) in one pass.

    Returns one row per column: ``column_name, n_rows, n_nonnull,
    n_distinct, min_val, max_val, completeness`` plus constraint
    verdicts ``is_complete`` (no nulls) and ``is_unique`` (non-null
    values all distinct)."""
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c), rsd))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(c).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `_nn_{c}`, `_nd_{c}`, `_mn_{c}`, `_mx_{c}`" for c in cols
    )
    long = one.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_expr}) AS "
        "(column_name, n_nonnull, n_distinct, min_val, max_val)",
    )
    return long.select(
        "column_name",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "min_val",
        "max_val",
        F.round(F.col("n_nonnull") / F.col("n_rows"), 6).alias("completeness"),
        (F.col("n_nonnull") == F.col("n_rows")).alias("is_complete"),
        (F.col("n_distinct") == F.col("n_nonnull")).alias("is_unique"),
    )
