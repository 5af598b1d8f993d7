"""Query catalog: every SURVEY §2 operator as a named, oracle-checked query.

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame`` with
(when SQL-expressible) an ANSI-SQL oracle string that DuckDB runs over
the same parquet tables.  The driver hash-compares both at sf0.01
(CORRECTNESS_r{N}.json); tests/test_oracle_parity.py replicates that
gate locally.

Determinism rules (so order-insensitive value-hash comparison works):
- every floating-point aggregate is ``round(x, N)`` in BOTH dialects
  (fp summation order differs between engines at the ulp level);
- every top-k has a unique tiebreaker column in its ORDER BY;
- nondeterministic ops (sample, approx_count_distinct) carry no oracle →
  driver records the weaker rows-only check (BASELINE.md notes).
"""

from spark_monotasks_spark.queries.registry import (
    ORACLE_REGISTRY,
    QUERY_REGISTRY,
    register,
)

# importing the modules populates the registries
from spark_monotasks_spark.queries import relational  # noqa: E402,F401
from spark_monotasks_spark.queries import pipeline_queries  # noqa: E402,F401
from spark_monotasks_spark.queries import extended  # noqa: E402,F401
from spark_monotasks_spark.queries import sql_surface  # noqa: E402,F401
from spark_monotasks_spark.queries import scalar_funcs  # noqa: E402,F401

__all__ = ["QUERY_REGISTRY", "ORACLE_REGISTRY", "register"]
