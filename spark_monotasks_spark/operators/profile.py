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

from pyspark.sql import DataFrame, Window
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


def iqr_outlier_screen(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    id_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier screen per group: values outside
    ``[q1 - k*IQR, q3 + k*IQR]`` are outliers — the numeric
    data-cleaning staple next to the text quality rules.

    Quartiles are RANK-BASED order statistics (the value at rank
    ``floor((n-1)*p) + 1``), never interpolated: each fence is then an
    exact data value combined with the dyadic ``k`` through two IEEE
    ops, so the boundary verdict is bit-deterministic and
    oracle-checkable (interpolating quantiles differ at ulp level
    between engines and can flip boundary rows).

    Returns one row per group: q1, q3, lo, hi, n_rows, n_outliers.
    Scale shape: ONE Exchange on the group keys serves the ranking
    window, the quartile broadcast-back (window max of the
    rank-selected value), and the final grouped aggregate — Catalyst
    reuses the partitioning, so the whole screen is a single shuffle
    of the (keys, value) projection."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    base = df.select(
        *keys,
        F.col(value_col).cast("double").alias("_v"),
        F.col(id_col).alias("_id"),
    )
    w_rank = Window.partitionBy(*keys).orderBy("_v", "_id")
    w_all = Window.partitionBy(*keys)
    ranked = base.select(
        *keys,
        "_v",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    q1_rank = F.floor((F.col("_n") - 1) * 0.25) + 1
    q3_rank = F.floor((F.col("_n") - 1) * 0.75) + 1
    with_q = ranked.select(
        *keys,
        "_v",
        "_n",
        F.max(F.when(F.col("_rn") == q1_rank, F.col("_v"))).over(w_all).alias("q1"),
        F.max(F.when(F.col("_rn") == q3_rank, F.col("_v"))).over(w_all).alias("q3"),
    )
    lo = F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1"))
    flagged = with_q.select(
        *keys,
        "q1",
        "q3",
        "_n",
        lo.alias("lo"),
        hi.alias("hi"),
        ((F.col("_v") < lo) | (F.col("_v") > hi)).cast("long").alias("_out"),
    )
    return flagged.groupBy(*keys).agg(
        F.first("q1").alias("q1"),
        F.first("q3").alias("q3"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.first("_n").alias("n_rows"),
        F.sum("_out").alias("n_outliers"),
    )


def skew_report(
    df: DataFrame, key_cols: Sequence[str], top_n: int = 20
) -> DataFrame:
    """Shuffle-key skew diagnosis — the pre-flight check before keying
    a 100 TB join/agg on a column: per-key row counts for the ``top_n``
    heaviest keys with each key's share of all rows and its multiple
    of the mean key load (the number AQE's skew-join threshold and a
    salting factor are chosen from).

    One groupBy builds the (small) per-key count relation; the totals
    are a 1-row aggregate broadcast back onto it (scalar by
    construction), and the report is a bounded TakeOrdered top-k.
    ``x_over_mean`` is computed as ``n * n_keys / total`` — integer
    multiply then ONE divide — so the value replays bit-identically in
    any IEEE engine."""
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("_tot"), F.count("*").alias("_k")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            *key_cols,
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("_tot"), 6).alias(
                "share"
            ),
            F.round(
                (F.col("n") * F.col("_k")).cast("double") / F.col("_tot"), 6
            ).alias("x_over_mean"),
        )
        .orderBy(F.col("n").desc(), *key_cols)
        .limit(top_n)
    )


def mad_outlier_screen(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Median-absolute-deviation outlier screen per group — the ROBUST
    counterpart of the Tukey fence (:func:`iqr_outlier_screen`): MAD's
    50% breakdown point survives contamination that drags quartiles.
    A value is an outlier when |x − median| > k · MAD.

    Exact integer arithmetic throughout (the dyadic playbook): values
    scale to cents, and every median is kept DOUBLED as the rank-pair
    sum ``med2 = x_(⌈n/2⌉) + x_(⌈(n+1)/2⌉)`` — exactly 2·median in
    int64, no interpolation.  Deviations are then the integers
    d = |2x − med2| (= 2·|x − median|), their doubled median is
    ``mad2`` (= 4·MAD), and the screen tests ``2·d > k·mad2``
    (⇔ |x − median| > k·MAD, every factor of two cancelled exactly).
    No float enters any comparison, so the verdict is engine-exact.

    Scale shape: both median passes run on ONE Exchange of the
    (keys, cents) projection — the rank windows and grouped aggregates
    all share the group-key partitioning.

    Returns one row per group: n_rows, med2, mad2, n_outliers.
    """
    base = df.select(
        *keys,
        F.round(F.col(value_col) * 100).cast("long").alias("_c"),
        F.col(id_col).alias("_id"),
    )
    w_rank = Window.partitionBy(*keys).orderBy("_c", "_id")
    w_all = Window.partitionBy(*keys)
    ranked = base.select(
        *keys,
        "_c",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    lo_rank = F.ceil(F.col("_n") / 2)
    hi_rank = F.ceil((F.col("_n") + 1) / 2)
    with_med = ranked.select(
        *keys,
        "_c",
        "_n",
        (
            F.max(F.when(F.col("_rn") == lo_rank, F.col("_c"))).over(w_all)
            + F.max(F.when(F.col("_rn") == hi_rank, F.col("_c"))).over(w_all)
        ).alias("med2"),
    )
    devs = with_med.select(
        *keys,
        "_n",
        "med2",
        F.abs(F.lit(2) * F.col("_c") - F.col("med2")).alias("_d"),
    )
    w_drank = Window.partitionBy(*keys).orderBy("_d")
    dev_ranked = devs.select(
        *keys,
        "_n",
        "med2",
        "_d",
        F.row_number().over(w_drank).alias("_drn"),
    )
    with_mad = dev_ranked.select(
        *keys,
        "_n",
        "med2",
        "_d",
        (
            F.max(F.when(F.col("_drn") == lo_rank, F.col("_d"))).over(w_all)
            + F.max(F.when(F.col("_drn") == hi_rank, F.col("_d"))).over(w_all)
        ).alias("mad2"),
    )
    return with_mad.groupBy(*keys).agg(
        F.max("_n").alias("n_rows"),
        F.max("med2").alias("med2"),
        F.max("mad2").alias("mad2"),
        F.sum(
            F.when(
                F.lit(2) * F.col("_d") > F.lit(k) * F.col("mad2"), 1
            ).otherwise(0)
        ).alias("n_outliers"),
    )
