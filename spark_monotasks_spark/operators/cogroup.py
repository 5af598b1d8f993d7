"""cogroup parity (SURVEY §2.3 RDD-level ops).

Reference: PairRDDFunctions.cogroup (:715-833, CoGroupedRDD.scala) —
group two keyed datasets by key and pair up both sides' value lists.
The reference's join/outer-join family is implemented ON cogroup
(PairRDDFunctions.scala:510-668).

Spark-first mapping: most cogroup uses ARE joins/aggregations — use
those.  The irreducible case (arbitrary per-key logic over both whole
groups) maps to ``df.groupBy(...).cogroup(other.groupBy(...))
.applyInPandas`` — Arrow-batched, one key-group pair per call, fully
distributed (one shuffle per side on the key, same as the reference's
CoGroupedRDD).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    output_schema: T.StructType | str,
) -> DataFrame:
    """cogroup + arbitrary per-key function.

    ``fn(left_group_pdf, right_group_pdf) -> pdf`` receives both sides'
    rows for one key (either may be empty — full-outer grouping, same
    as reference cogroup) and returns any number of output rows.
    """
    keys = list(on)
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema=output_schema)
    )


def cogroup_collect(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_value: str,
    right_value: str,
) -> DataFrame:
    """The reference's literal cogroup shape: key → (list of left
    values, list of right values).  Pure DataFrame (no Python):
    aggregate each side, full-outer join on the key — two shuffles,
    exactly CoGroupedRDD's cost, arrays sorted for determinism.

    Reference-parity details the naive form gets wrong: the key join is
    null-safe (CoGroupedRDD hashes NULL keys into one group, while an
    equi-join would split them), and NULL values survive into the lists
    (collect_list drops bare NULLs, so values ride inside structs)."""
    from pyspark.sql import functions as F

    keys = list(on)

    def collect_with_nulls(value_col: str, alias: str):
        # struct-wrap: collect_list skips NULL elements but keeps
        # non-null structs with a NULL field
        wrapped = F.array_sort(F.collect_list(F.struct(F.col(value_col).alias("v"))))
        return F.transform(wrapped, lambda x: x["v"]).alias(alias)

    lg = left.groupBy(*keys).agg(collect_with_nulls(left_value, "left_values"))
    rg = right.groupBy(*keys).agg(collect_with_nulls(right_value, "right_values"))
    cond = None
    for k in keys:
        eq = lg[k].eqNullSafe(rg[k])
        cond = eq if cond is None else (cond & eq)
    joined = lg.join(rg, on=cond, how="full_outer")
    empty_l = F.array().cast(lg.schema["left_values"].dataType)
    empty_r = F.array().cast(rg.schema["right_values"].dataType)
    return joined.select(
        *[F.coalesce(lg[k], rg[k]).alias(k) for k in keys],
        F.coalesce(F.col("left_values"), empty_l).alias("left_values"),
        F.coalesce(F.col("right_values"), empty_r).alias("right_values"),
    )
