"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full catalog from
spark_monotasks_spark.queries (one entry per SURVEY §2 operator family,
DuckDB oracle SQL wherever the semantics are SQL-expressible and
deterministic — see BASELINE.md notes on approx/sample exclusions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    return QUERY_REGISTRY["tpch_q1_pricing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    from spark_monotasks_spark.queries import ORACLE_REGISTRY

    return dict(ORACLE_REGISTRY)
