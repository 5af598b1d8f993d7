"""Distributed model-evaluation metrics (beyond-reference, marked).

The reference's MLlib carries ``BinaryClassificationMetrics``
(mllib/evaluation/BinaryClassificationMetrics.scala — score-grouped
confusion counts over a sorted RDD); these are the DataFrame-native
equivalents, built so every step survives a 100 TB scoring table:

* :func:`binary_auc` — exact ROC-AUC as the Mann-Whitney rank
  statistic with average ranks for ties.  The global rank ordering
  NEVER plans an un-partitioned window (the catalog-wide plan gate
  bans those): scores collapse to one row per distinct value with a
  hash aggregate, and the cumulative counts run through
  ``operators.indexing.running_total`` — the same two-pass
  range-partitioned prefix sum as ``zip_with_index``, so a billion
  distinct scores spread over the cluster instead of one reducer.
* :func:`calibration_bins` — fixed-width reliability-diagram bins
  (predicted-probability mean vs observed positive rate per bin).
  One hash aggregate; bin ids are ``floor(p * bins)`` so the map-side
  partial agg does all the work.

Exactness: ranks and counts are integers, average ranks are exact
half-integers, and their products/sums stay far below 2^53 — every
quantity up to the single final division is bit-exact in IEEE double,
which is why the AUC carries a DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_monotasks_spark.operators.indexing import running_total


def binary_auc(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U with average ranks for ties).

    AUC = (S_pos − P(P+1)/2) / (P·N) where S_pos is the sum of the
    positives' average ranks under ascending score order.  Ties share
    the mean of the rank range they occupy — the textbook estimator,
    identical to sklearn's ``roc_auc_score`` on the same data.

    Returns a single-row DataFrame: ``auc``, ``n_pos``, ``n_neg``.
    ``label_col`` must be 0/1 integers.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    g = df.select(score.alias("_s"), label.alias("_y")).groupBy("_s").agg(
        F.count("*").alias("_n"), F.sum("_y").alias("_np")
    )
    cum = running_total(g, "_n", ["_s"], total_col="_cum")
    ranked = cum.withColumn(
        "_avg_rank",
        (F.col("_cum") - F.col("_n")) + (F.col("_n") + F.lit(1)) / F.lit(2.0),
    )
    return ranked.agg(
        F.round(
            (
                F.sum(F.col("_np") * F.col("_avg_rank"))
                - (F.sum("_np") * (F.sum("_np") + F.lit(1))) / F.lit(2.0)
            )
            / (F.sum("_np") * (F.sum("_n") - F.sum("_np"))),
            round_to,
        ).alias("auc"),
        F.sum("_np").cast("long").alias("n_pos"),
        (F.sum("_n") - F.sum("_np")).cast("long").alias("n_neg"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str | Column,
    is_a_col: str | Column,
    round_to: int = 6,
    crit_c: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, exact and distributed.

    D = max over observed values of |F_a(v) − F_b(v)| where F is each
    sample's empirical CDF.  ``is_a_col`` is 1 for sample A rows, 0 for
    B.  Same scale shape as :func:`binary_auc`: one hash aggregate to
    distinct values, then BOTH cumulative counts through a single
    two-pass prefix sum (the multi-column ``running_total`` — one range
    exchange, not two), then a scalar max.  Returns one row:
    ``ks_stat``, ``n_a``, ``n_b``, ``crit_05`` (the large-sample 5%
    critical value c·sqrt((n+m)/nm), c=1.358) and ``reject_05``.

    Cumulative counts are exact integers; each CDF value is ONE IEEE
    division — bit-identical cross-engine, which is what lets the
    statistic carry a value oracle.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    a = F.col(is_a_col) if isinstance(is_a_col, str) else is_a_col
    g = df.select(v.alias("_v"), a.alias("_a")).groupBy("_v").agg(
        F.sum("_a").alias("_na"), (F.count("*") - F.sum("_a")).alias("_nb")
    )
    cum = running_total(
        g, ["_na", "_nb"], ["_v"], total_col=["_ca", "_cb"]
    )
    # totals = the LAST cumulative value (counts are non-negative, so
    # the prefix sum is nondecreasing and max = total) — a scalar
    # aggregate broadcast back, NOT an un-partitioned window over the
    # distinct-value relation (which can be corpus-sized)
    tot = cum.agg(F.max("_ca").alias("_ta"), F.max("_cb").alias("_tb"))
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("_ca") / F.col("_ta") - F.col("_cb") / F.col("_tb")
        ).alias("_d"),
        "_ta",
        "_tb",
    )
    ta, tb = F.max("_ta").cast("double"), F.max("_tb").cast("double")
    crit = F.lit(crit_c) * F.sqrt((ta + tb) / (ta * tb))
    return diffs.agg(
        F.round(F.max("_d"), round_to).alias("ks_stat"),
        F.max("_ta").cast("long").alias("n_a"),
        F.max("_tb").cast("long").alias("n_b"),
        F.round(crit, round_to).alias("crit_05"),
        F.when(F.max("_d") > crit, F.lit(1)).otherwise(F.lit(0)).alias(
            "reject_05"
        ),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str | Column,
    y_col: str | Column,
    round_to: int = 6,
) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation, distributed.

    Average ranks are carried as the INTEGER 2·rank = 2·cum_lt + n + 1
    (from the two-pass prefix sum — no global zip, no one-task
    window); rho = Pearson on the rank pairs, affine-invariant so the
    2x scaling cancels.  Sufficient statistics are exact integer sums
    (decimal(38) against overflow); floats appear only in the final
    correctly-rounded conversions/division/sqrt, so the result is
    bit-identical to an equivalent integer-exact SQL replay.

    Returns one row: ``n``, ``rho``.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    rows = df.select(x.alias("_x"), y.alias("_y"))

    def _ranks2(col: str) -> DataFrame:
        g = rows.groupBy(col).agg(F.count("*").alias("_n"))
        cum = running_total(g, "_n", [col], total_col="_cum")
        return cum.select(
            col,
            (2 * (F.col("_cum") - F.col("_n")) + F.col("_n") + 1)
            .cast("long")
            .alias(f"_r2{col}"),
        )

    j = (
        rows.join(_ranks2("_x"), "_x")
        .join(_ranks2("_y"), "_y")
        .select(F.col("_r2_x").alias("_a"), F.col("_r2_y").alias("_b"))
    )
    dec = "decimal(38,0)"
    s = j.agg(
        F.count("*").cast(dec).alias("_n"),
        F.sum("_a").cast(dec).alias("_sa"),
        F.sum("_b").cast(dec).alias("_sb"),
        F.sum(F.col("_a") * F.col("_b")).cast(dec).alias("_sab"),
        F.sum(F.col("_a") * F.col("_a")).cast(dec).alias("_saa"),
        F.sum(F.col("_b") * F.col("_b")).cast(dec).alias("_sbb"),
    )
    num = (
        F.col("_n") * F.col("_sab") - F.col("_sa") * F.col("_sb")
    ).cast("double")
    den = F.sqrt(
        (F.col("_n") * F.col("_saa") - F.col("_sa") * F.col("_sa")).cast(
            "double"
        )
        * (F.col("_n") * F.col("_sbb") - F.col("_sb") * F.col("_sb")).cast(
            "double"
        )
    )
    return s.select(
        F.col("_n").cast("long").alias("n"),
        F.round(num / den, round_to).alias("rho"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str | Column,
    label_col: str | Column,
    bins: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Reliability-diagram data: fixed-width probability bins with the
    mean predicted probability and the observed positive rate per bin.

    ``prob_col`` should already be in [0, 1]; values exactly 1.0 land
    in the top bin.  Returns (bin, n, mean_pred, pos_rate) — a
    well-calibrated model has mean_pred ≈ pos_rate per bin.  One hash
    aggregate over ``floor(p·bins)``: map-side partials reduce each
    task's contribution to ≤ ``bins`` rows, so the shuffle is O(bins ·
    tasks) regardless of table size.
    """
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    binned = df.select(
        F.least(
            F.floor(p * F.lit(bins)).cast("long"), F.lit(bins - 1)
        ).alias("bin"),
        p.alias("_p"),
        label.alias("_y"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.avg("_p"), round_to).alias("mean_pred"),
        F.round(F.avg("_y"), round_to).alias("pos_rate"),
    )
