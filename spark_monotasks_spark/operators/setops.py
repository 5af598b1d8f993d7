"""Set operations with the reference's exact semantics (SURVEY §2.7/§7.4).

Three different UNION/EXCEPT semantics coexist in the reference:

- ``df.unionAll``      = bag union (P basicOperators.scala:77)
- SQL ``UNION``        = Distinct(Union) (SqlParser.scala:127)
- ``Intersect``        = set semantics (RDD.intersection, RDD.scala:744)
- ``Except``           = *hybrid*: removes ALL left rows that appear in
  right, but KEEPS duplicates of surviving left rows
  (SubtractedRDD.scala:143-145 buffers left values per key and drops
  keys present in right) — neither SQL EXCEPT (distinct) nor EXCEPT ALL.

``except_reference`` reproduces the hybrid exactly via left_anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Bag union — reference df.unionAll (basicOperators.scala:77)."""
    return left.union(right)


def union_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """SQL UNION [DISTINCT] — Distinct(Union) (SqlParser.scala:127)."""
    return left.union(right).distinct()


def intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    """Set-semantics intersect (P basicOperators.scala:214 →
    RDD.intersection which dedups).  Spark's df.intersect matches."""
    return left.intersect(right)


def except_reference(left: DataFrame, right: DataFrame) -> DataFrame:
    """The reference's hybrid EXCEPT (basicOperators.scala:200 →
    RDD.subtract): drop every left row whose full-row value appears in
    right; retain duplicates of the survivors.

    A left_anti join over null-safe equality (``<=>``) on every column
    reproduces this exactly — the reference keys a hash map on whole
    rows, so NULLs compare equal there, and ``<=>`` matches that where a
    plain equi-join would leak NULL-keyed rows through."""
    from pyspark.sql import functions as F

    l, r = left.alias("l"), right.alias("r")
    cond = None
    for c in left.columns:
        eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        cond = eq if cond is None else (cond & eq)
    return l.join(r, on=cond, how="left_anti").select(
        *[F.col(f"l.{c}").alias(c) for c in left.columns]
    )


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """ANSI SQL EXCEPT (distinct) — what the DuckDB oracle computes:
    distinct(left) minus every row present in right.  ``df.subtract``
    IS Spark's EXCEPT DISTINCT.  (Not ``exceptAll(...).distinct()``:
    that removes only one occurrence per right row before deduping, so
    a duplicated left row that also appears in right would wrongly
    survive — caught by the property suite.)"""
    return left.subtract(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """ANSI EXCEPT ALL (multiset difference) — beyond-reference bonus."""
    return left.exceptAll(right)


def subtract_by_key(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """PairRDDFunctions.subtractByKey (PairRDDFunctions.scala:844):
    keep left rows whose KEY does not occur in right."""
    return left.join(right.select(key).distinct(), on=key, how="left_anti")
