"""Sampling + NA handling (SURVEY §2.9).

Reference: Sample (L basicOperators.scala:270, P :62; DataFrame.scala:676;
RDD.scala:628 sample / :647 randomSplit / :664 takeSample), stratified
sampleByKey[Exact] (PairRDDFunctions.scala:233/:264), HiveQL TABLESAMPLE
(HiveQl.scala:847,:863); DataFrameNaFunctions.scala (drop :40-101,
fill :110+, replace).

Seed semantics differ across Spark versions (SURVEY §7.4.11) — sampling
queries are checked by cardinality bounds, not value hashes.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame


def sample(
    df: DataFrame, fraction: float, seed: int | None = None, with_replacement: bool = False
) -> DataFrame:
    """Bernoulli (or Poisson, with replacement) per-row sample — fully
    distributed, no coordination; scale-free."""
    return df.sample(withReplacement=with_replacement, fraction=fraction, seed=seed)


def random_split(df: DataFrame, weights: Sequence[float], seed: int | None = None) -> list[DataFrame]:
    """RDD.randomSplit (RDD.scala:647)."""
    return df.randomSplit(list(weights), seed=seed)


def sample_by(df: DataFrame, col: str, fractions: Mapping[Any, float], seed: int | None = None) -> DataFrame:
    """Stratified sampleByKey (PairRDDFunctions.scala:233)."""
    return df.sampleBy(col, dict(fractions), seed=seed)


def na_drop(
    df: DataFrame, how: str = "any", thresh: int | None = None, subset: Sequence[str] | None = None
) -> DataFrame:
    """DataFrameNaFunctions.drop (:40-101) — any/all/thresh/cols, same API."""
    return df.na.drop(how=how, thresh=thresh, subset=subset)


def na_fill(df: DataFrame, value: Any, subset: Sequence[str] | None = None) -> DataFrame:
    """DataFrameNaFunctions.fill (:110+)."""
    return df.na.fill(value, subset=subset)


def na_replace(df: DataFrame, to_replace: Any, value: Any, subset: Sequence[str] | None = None) -> DataFrame:
    """DataFrameNaFunctions.replace."""
    return df.na.replace(to_replace, value, subset=subset)
