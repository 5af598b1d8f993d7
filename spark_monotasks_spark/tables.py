"""Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets column pruning +
filter pushdown + (on partitioned layouts) partition pruning for free —
the reference implemented these by hand in parquet/newParquet.scala and
parquet/ParquetFilters.scala; modern Spark's vectorized reader subsumes
both (SURVEY §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at ANY scale factor (region
#: and nation are bounded-cardinality in TPC-H; always broadcast-join them).
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _fix_nanos(df: DataFrame) -> DataFrame:
    """Convert TIMESTAMP(NANOS)-read-as-long columns to TimestampType.

    Spark rejects parquet TIMESTAMP(NANOS) unless
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py),
    which surfaces them as nanos-since-epoch longs.  The driver's events
    data has zero sub-microsecond bits, so integral ``div 1000`` →
    ``timestamp_micros`` is exact and matches the DuckDB oracle's ns→µs
    view of the same values.
    """
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # TIMESTAMP_NTZ to match the other tables' parquet ms columns
            # and the oracle's timezone-naive view (session tz is UTC, so
            # the TimestampType→NTZ cast is identity).
            df = df.withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"),
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return _fix_nanos(spark.read.parquet(table_path(sf_dir, name)))


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every test table; optionally register temp views for SQL.

    Mirrors the reference's SimpleCatalog temp-table registration
    (SQLContext.scala:107, catalyst/analysis/Catalog.scala) — temp views
    in modern Spark are the same in-memory name→plan map.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = _fix_nanos(spark.read.parquet(path))
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
