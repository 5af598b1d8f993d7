"""Partitioning helpers — the knobs SURVEY §2.9/§4.3 map to
repartition/coalesce, plus the compute-spread heuristic shared by the
CPU-heavy pipeline/script paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_cluster(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer splits than the
    cluster has cores.

    For scans whose per-row downstream work dominates IO (hash-signature
    passes, external-script transforms, per-row decode), a small split
    count — one split per small file locally, or heavy partition pruning
    at scale — pins the whole job to a few tasks.  One cheap shuffle of
    the compact source rows unlocks full parallelism.  No-op when the
    scan is already wide enough.
    """
    n = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
