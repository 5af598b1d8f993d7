"""UDAF / UDTF surface (SURVEY §2.11).

The reference has NO native UDAF API (a Spark 1.5 feature); custom
aggregation went through Hive UDAF bridges (hiveUdfs.scala:192,:224).
The modern Spark-first mapping is a pandas grouped-agg UDF: Arrow-batched,
one call per group per partition with partial aggregation NOT available —
so for algebraic aggregates prefer built-in F.* compositions; reserve
pandas UDAFs for genuinely holistic functions (median-like, custom
weighted schemes).

UDTFs (generators.scala:79 ``UserDefinedGenerator``, DataFrame.explode
:712) map to ``F.explode`` over an array-returning expression — JVM-side
when the array logic is expressible in F.*, else an arrow-optimized
Python UDTF (Spark 4 ``F.udtf``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean_udaf(v: pd.Series, w: pd.Series) -> float:  # type: ignore[misc]
    """Holistic-style UDAF example: Σvw/Σw over the whole group.
    (Algebraic — a real deployment would use the F.* composition below;
    this exists to prove the grouped-agg UDF path end-to-end.)"""
    den = float(w.sum())
    return float((v * w).sum() / den) if den else None


def weighted_mean_builtin(v: Column, w: Column) -> Column:
    """The JVM-side twin: same result, stays in codegen, gets partial
    aggregation — the form to prefer at scale."""
    return F.sum(v * w) / F.sum(w)


def explode_words_udtf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """UserDefinedGenerator parity: one row per token with its offset.
    Pure F.* (posexplode over split) — the generator runs JVM-side, no
    Python worker."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).filter(F.col("token") != "")
