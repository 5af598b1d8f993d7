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
