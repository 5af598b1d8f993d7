"""Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets column pruning +
filter pushdown + (on partitioned layouts) partition pruning for free —
the reference implemented these by hand in parquet/newParquet.scala and
parquet/ParquetFilters.scala; modern Spark's vectorized reader subsumes
both (SURVEY §4.2).

Sessions: every load path first calls :func:`ensure_parity_confs` so the
catalog works on ANY SparkSession — including a vanilla
``SparkSession.builder.getOrCreate()`` with none of the configs from
``session.get_spark``.  The reference (a Spark 1.3-era fork) has
pre-ANSI semantics and the events table carries parquet
TIMESTAMP(NANOS); both need runtime-settable confs on modern Spark 4.

Laziness: :func:`load_tables` returns a :class:`Tables` mapping that
reads each parquet file only on first access, so a query touching only
``lineitem`` can never fail on (or waste planning time over) an
unrelated table — and at 100 TB no view is registered for data the
query never reads.
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Iterator, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Per-session cache of table DataFrame DEFINITIONS (r8, guide §4/§6).
#: ``spark.read.parquet`` costs a footer read + schema inference + a
#: chain of Py4J calls (~60-130 ms warm) and the catalog re-ran it for
#: every query construction — ~2.5 tables × 96 bench entries per pass.
#: A real deployment reads tables from a catalog whose relations are
#: resolved once per session, not re-inferred per query; this cache is
#: that catalog.  It holds ONLY the unresolved scan plan (path +
#: schema): execution still scans the parquet files every time, so no
#: result or data is ever reused across runs.  Keyed weakly by session
#: (a stopped session's entries are dropped with it) and by sf_dir, so
#: concurrent scale factors in one session stay distinct.  The base
#: tables are immutable test fixtures; nothing in the repo rewrites a
#: table path in place within a session (verified — tests only read).
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

#: Sessions whose parity confs are already pinned: ensure_parity_confs
#: paid 4 Py4J conf round-trips per load_table call (~1000 per bench
#: pass).  All four confs are pinned identically everywhere, so once
#: per session is enough.
_PARITY_PINNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()

#: Per-session record of which (sf_dir, name) each table VIEW currently
#: points at, so repeated Tables instances skip the
#: createOrReplaceTempView Py4J call (~20 ms) when the registered view
#: is already ours for the same key — and re-register when the sf_dir
#: changes mid-session (the oracle-parity suite mixes scale factors).
#: Catalog view names are namespaced away from user views everywhere in
#: the repo (``_ins_src_*``, test-local names), so skipping a
#: re-registration of an identical view is unobservable.
_VIEW_REG: "weakref.WeakKeyDictionary[SparkSession, dict[str, tuple[str, str]]]" = (
    weakref.WeakKeyDictionary()
)

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

#: Runtime-settable confs the catalog's semantics depend on.  These are
#: ALSO set by session.get_spark at build time; setting them here too
#: makes every query self-sufficient on a session we didn't build
#: (e.g. the external correctness harness' vanilla session):
#:
#: - nanosAsLong: parquet TIMESTAMP(NANOS) (events.ts) otherwise throws
#:   PARQUET_TYPE_ILLEGAL at read time.
#: - ansi.enabled=false: reference parity — int division -> double,
#:   '1'+1 string promotion, lenient casts, silent overflow
#:   (HiveTypeCoercion.scala:230,:530; Cast.scala:28).
#: - sizeOfNull=false: size(NULL) -> NULL, matching the oracle.
#: - session.timeZone=UTC: timestamp oracles are computed in UTC.
PARITY_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.sizeOfNull": "false",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_parity_confs(spark: SparkSession) -> None:
    """Defensively pin reference-parity confs on an existing session.

    No-ops when already set (session.get_spark sets the same values at
    build time).  All four confs are runtime-settable on Spark 4.
    Pinning is remembered per session (weak set) so repeated catalog
    loads skip the conf round-trips.
    """
    if spark in _PARITY_PINNED:
        return
    all_ok = True
    for key, value in PARITY_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # a future Spark making one of these static shouldn't take
            # down every query; the read below will surface a real error
            all_ok = False
    # only remember the session as pinned when every conf was verified
    # or set without exception — a transiently failed pin is retried on
    # the next load (ADVICE r8: the pre-cache code re-attempted every
    # call, and the memo must not weaken that recovery path)
    if all_ok:
        _PARITY_PINNED.add(spark)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def invalidate_view_record(spark: SparkSession, name: str) -> None:
    """Forget that a catalog temp view is registered (ADVICE r8).

    The public api surface (``drop_temp_table`` /
    ``register_data_frame_as_table``) can drop or replace a view named
    like a catalog table outside Tables' knowledge; without this hook a
    later Tables access would skip re-registration and SQL would see the
    replacement (or nothing).  Callers that mutate temp views must
    invalidate so the next access re-fires createOrReplaceTempView."""
    reg = _VIEW_REG.get(spark)
    if reg is not None:
        reg.pop(name, None)


def _fix_nanos(df: DataFrame) -> DataFrame:
    """Convert TIMESTAMP(NANOS)-read-as-long columns to TimestampType.

    Spark rejects parquet TIMESTAMP(NANOS) unless
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (ensured above), which
    surfaces them as nanos-since-epoch longs.  The driver's events data
    has zero sub-microsecond bits, so integral ``div 1000`` →
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
    ensure_parity_confs(spark)
    key = (os.path.realpath(sf_dir), name)
    path = table_path(sf_dir, name)
    # existence is re-checked on cache HITS too (ADVICE r8): a table
    # directory removed mid-session then raises the explicit error here
    # instead of a less helpful scan-time failure.  One local stat per
    # call — noise next to the Py4J traffic the cache removes.
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"table {name!r} not found at {path} — is sf_dir={sf_dir!r} correct?"
        )
    per_session = _DF_CACHE.setdefault(spark, {})
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = _fix_nanos(spark.read.parquet(path))
    per_session[key] = df
    return df


class Tables(Mapping):
    """Lazy name→DataFrame mapping over the sf_dir parquet tables.

    Each table is read (and its temp view registered, when
    ``register_views``) on FIRST ACCESS only.  Iteration / ``len`` cover
    the tables present on disk without loading any of them.
    """

    def __init__(
        self, spark: SparkSession, sf_dir: str, register_views: bool = True
    ) -> None:
        self._spark = spark
        self._sf_dir = sf_dir
        self._register_views = register_views
        self._cache: dict[str, DataFrame] = {}
        self._present = tuple(
            n for n in TABLE_NAMES if os.path.exists(table_path(sf_dir, n))
        )
        if not self._present:
            raise FileNotFoundError(
                f"no tables found under sf_dir={sf_dir!r} "
                f"(expected e.g. {table_path(sf_dir, 'lineitem')})"
            )

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            df = load_table(self._spark, self._sf_dir, name)
            if self._register_views:
                key = (os.path.realpath(self._sf_dir), name)
                reg = _VIEW_REG.setdefault(self._spark, {})
                if reg.get(name) != key:
                    df.createOrReplaceTempView(name)
                    reg[name] = key
            self._cache[name] = df
        return self._cache[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._present)

    def __len__(self) -> int:
        return len(self._present)

    def register(self, *names: str) -> "Tables":
        """Force temp-view registration for ``names`` (all if empty) —
        for SQL-string queries that reference views without a dict
        access."""
        for name in names or self._present:
            self[name]
        return self


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> Tables:
    """Lazy-load the test tables; views register on first access.

    Mirrors the reference's SimpleCatalog temp-table registration
    (SQLContext.scala:107, catalyst/analysis/Catalog.scala) — temp views
    in modern Spark are the same in-memory name→plan map.
    """
    ensure_parity_confs(spark)
    return Tables(spark, sf_dir, register_views=register_views)
