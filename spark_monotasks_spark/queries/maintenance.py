"""Table-maintenance catalog entries: merge/upsert and CDC apply.

The reference's write surface stops at INSERT INTO / INSERT OVERWRITE
(hive/execution/InsertIntoHiveTable.scala); the upsert/CDC shapes here
complete that surface the way a modern warehouse user expects.  Both
oracles state the EXPECTED FINAL TABLE directly (not a re-implementation
of the merge), so the driver check validates merge semantics, not just
join plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_monotasks_spark.operators.merge import apply_cdc, merge_upsert
from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables

#: slim orders projection used by both entries — merge requires
#: matching schemas between base and updates.
_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["orders"].select(*_COLS)


@register(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N',
             o_totalprice + 100.0
      FROM orders WHERE o_orderkey % 100 = 50
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS o_totalprice
    FROM updates
    UNION ALL
    SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus,
           round(b.o_totalprice, 2) AS o_totalprice
    FROM orders b
    WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert (operators.merge.merge_upsert): a CDC-sized update batch
    — price corrections for keys ≡0 (mod 100), brand-new orders for
    keys ≡50 — merged into orders via ONE broadcast anti-join + union;
    the base table never shuffles.  The oracle states the expected
    final table independently of the merge algebra."""
    base = _base(spark, sf_dir)
    corrections = base.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 10.0
    )
    inserts = base.filter(F.col("o_orderkey") % 100 == 50).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
    )
    merged = merge_upsert(base, corrections.unionByName(inserts), on=["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@register(
    "apply_cdc_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(CASE WHEN o_orderkey % 100 = 0
                      THEN o_totalprice + 10.0 ELSE o_totalprice END, 2)
             AS o_totalprice
    FROM orders WHERE o_orderkey % 100 != 7
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, 'N',
           round(o_totalprice + 100.0, 2)
    FROM orders WHERE o_orderkey % 100 = 50
    """,
)
def apply_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (operators.merge.apply_cdc): a change log containing a
    superseded delete (seq 1 'D' beaten by seq 2 'U' on keys ≡0), a
    live delete (keys ≡7), and inserts (keys ≡50) collapses to
    latest-change-per-key — the window runs over the LOG only — then
    applies through one anti-join + union.  The oracle is the expected
    final snapshot, written without any merge machinery, so seq
    ordering, delete semantics, and upsert semantics are all
    value-checked."""
    base = _base(spark, sf_dir)
    upd_keys = base.filter(F.col("o_orderkey") % 100 == 0)
    stale_deletes = upd_keys.select(
        *_COLS, F.lit("D").alias("op"), F.lit(1).alias("seq")
    )
    updates = upd_keys.withColumn(
        "o_totalprice", F.col("o_totalprice") + 10.0
    ).select(*_COLS, F.lit("U").alias("op"), F.lit(2).alias("seq"))
    deletes = (
        base.filter(F.col("o_orderkey") % 100 == 7)
        .select(*_COLS, F.lit("D").alias("op"), F.lit(5).alias("seq"))
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 100 == 50)
        .select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        )
        .select("*", F.lit("I").alias("op"), F.lit(3).alias("seq"))
    )
    log = stale_deletes.unionByName(updates).unionByName(deletes).unionByName(inserts)
    final = apply_cdc(base, log, on=["o_orderkey"])
    return final.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@register(
    "incremental_agg_refresh",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS price_count,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS price_sum,
           round(CAST(avg(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 6)
             AS price_avg,
           round(CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS price_min,
           round(CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS price_max
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance (operators.incremental): history
    (orders before 1997) is aggregated ONCE into per-key partial state;
    the 1997+ delta folds in via aggregate_state(delta) + a key-wise
    state merge — history never rescanned, the 100 TB refresh pattern.
    The oracle is a FULL recompute over all orders: exact equality
    (decimal measures, so partial/merge order can't drift) proves the
    decomposable-algebra maintenance matches a from-scratch GROUP BY."""
    from spark_monotasks_spark.operators import incremental as inc

    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    keys = ["o_orderstatus", "o_orderpriority"]
    hist_state = inc.aggregate_state(
        o.filter(F.col("o_orderdate") < cutoff).drop("o_orderdate"), keys, ["price"]
    )
    delta = o.filter(F.col("o_orderdate") >= cutoff).drop("o_orderdate")
    refreshed = inc.incremental_refresh(hist_state, delta, keys, ["price"])
    final = inc.finalize_state(refreshed, keys, ["price"])
    return final.select(
        *keys,
        F.col("price_count"),
        F.round(F.col("price_sum").cast("double"), 2).alias("price_sum"),
        F.round(F.col("price_avg").cast("double"), 6).alias("price_avg"),
        F.round(F.col("price_min").cast("double"), 2).alias("price_min"),
        F.round(F.col("price_max").cast("double"), 2).alias("price_max"),
    )


from spark_monotasks_spark.operators.layout import zorder_key, zorder_sql

_Z_A = "o_custkey % 65536"
_Z_B = "(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) % 65536"


@register(
    "zorder_layout_key",
    oracle=f"""
    SELECT o_orderkey, {zorder_sql(_Z_A, _Z_B)} AS zkey
    FROM orders
    """,
)
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key (operators.layout.zorder_key):
    interleaves customer-key and order-day bits so a
    repartitionByRange(zkey) + sortWithinPartitions write clusters
    files in BOTH dimensions — min/max zone maps then prune on either
    predicate (the OPTIMIZE ZORDER pattern).  The oracle recomputes
    every key with the same bit arithmetic rendered as portable SQL."""
    o = load_tables(spark, sf_dir)["orders"]
    sec = F.col("o_orderdate").cast("timestamp").cast("long")
    a = (F.col("o_custkey") % 65536).cast("long")
    b = (F.floor(sec / F.lit(86400)).cast("long") % 65536)
    return o.select("o_orderkey", zorder_key(a, b).alias("zkey"))


from spark_monotasks_spark.operators.merge import scd2_apply


@register(
    "scd2_customer_dim",
    oracle="""
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           DATE '2020-01-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to,
           TRUE AS is_current
    FROM customer WHERE c_custkey % 10 != 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2),
           DATE '2020-01-01', DATE '2024-06-01', FALSE
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, round(c_acctbal + 50.0, 2),
           DATE '2024-06-01', NULL, TRUE
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey + 10000000, 'NEWSEG', 1.0,
           DATE '2024-06-01', NULL, TRUE
    FROM customer WHERE c_custkey % 10 = 7
    """,
)
def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance (operators.merge.scd2_apply):
    customers become a versioned dimension (one open version each,
    valid from 2020-01-01); an update batch then carries a REAL change
    (keys ≡0 mod 10: acctbal +50), a NO-OP update (keys ≡3: identical
    attributes — must NOT create a version), and brand-new keys
    (≡7, shifted by 10M).  Changed keys close their old version at the
    batch timestamp and open a new one; no-ops leave the dimension
    byte-identical.  The oracle states the expected final versioned
    table directly.  Scale shape: the dimension is touched only by one
    broadcast inner join (change detection) + one broadcast anti-join
    + union — at 100 TB the dim never shuffles."""
    c = load_tables(spark, sf_dir)["customer"]
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 50.0).alias("c_acctbal"),
    )
    noop = c.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    fresh = c.filter(F.col("c_custkey") % 10 == 7).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit(1.0).alias("c_acctbal"),
    )
    updates = (
        changed.unionByName(noop)
        .unionByName(fresh)
        .withColumn("effective_ts", F.lit("2024-06-01").cast("date"))
    )
    out = scd2_apply(
        dim,
        updates,
        on=["c_custkey"],
        tracked=["c_mktsegment", "c_acctbal"],
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    )


from spark_monotasks_spark.operators.profile import profile_columns

#: the profiled twin of orders used by data_profile_constraints — one
#: guaranteed-unique column, one synthesized-nullable column (keys ≡0
#: mod 5 null out), one plain double column.
_PROFILE_ORACLE_COL = """
    SELECT '{name}' AS column_name,
           count(*) AS n_rows,
           count({name}) AS n_nonnull,
           count(DISTINCT {name}) AS n_distinct,
           CAST(min({name}) AS DOUBLE) AS min_val,
           CAST(max({name}) AS DOUBLE) AS max_val,
           round(count({name}) * 1.0 / count(*), 6) AS completeness,
           count({name}) = count(*) AS is_complete,
           count(DISTINCT {name}) = count({name}) AS is_unique
    FROM t
"""


@register(
    "data_profile_constraints",
    oracle="WITH t AS (SELECT o_orderkey, CASE WHEN o_orderkey % 5 != 0 "
    "THEN o_custkey END AS cust_nullable, o_totalprice FROM orders)\n"
    + " UNION ALL ".join(
        _PROFILE_ORACLE_COL.format(name=n)
        for n in ("o_orderkey", "cust_nullable", "o_totalprice")
    ),
)
def data_profile_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style verification suite (operators.profile.profile_columns):
    ONE aggregate pass over orders computes completeness, distinctness,
    and min/max for three columns — a unique key (is_unique must come
    back true), a synthesized 20%-null column (completeness < 1,
    is_complete false), and a plain measure — then unpivots to one row
    per column via stack, never touching the driver.  The oracle
    recomputes each column's profile independently.  Scale shape: a
    single scan with map-side partials; exact COUNT(DISTINCT) plans
    via Expand (documented), and ``exact_distinct=False`` switches to
    HLL++ sketches for the 100 TB path (no Expand, rows-only there)."""
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_custkey")).alias(
            "cust_nullable"
        ),
        "o_totalprice",
    )
    return profile_columns(o, ["o_orderkey", "cust_nullable", "o_totalprice"])


from spark_monotasks_spark.operators.profile import iqr_outlier_screen


@register(
    "iqr_outlier_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(o_totalprice AS DOUBLE),
                                         o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ), q AS (
      SELECT o_orderpriority,
             max(CASE WHEN rn = CAST(floor((n-1)*0.25) AS BIGINT) + 1
                      THEN v END) AS q1,
             max(CASE WHEN rn = CAST(floor((n-1)*0.75) AS BIGINT) + 1
                      THEN v END) AS q3,
             max(n) AS n_rows
      FROM ranked GROUP BY o_orderpriority
    ), f AS (
      SELECT o_orderpriority, q1, q3,
             q1 - 1.5*(q3-q1) AS lo, q3 + 1.5*(q3-q1) AS hi, n_rows
      FROM q
    )
    SELECT f.o_orderpriority,
           round(f.q1, 2) AS q1, round(f.q3, 2) AS q3,
           round(f.lo, 6) AS lo, round(f.hi, 6) AS hi,
           f.n_rows,
           CAST(sum(CASE WHEN r.v < f.lo OR r.v > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM f JOIN ranked r USING (o_orderpriority)
    GROUP BY f.o_orderpriority, f.q1, f.q3, f.lo, f.hi, f.n_rows
    """,
)
def iqr_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen (operators.profile.iqr_outlier_screen):
    per order priority, rank-based quartiles of o_totalprice (order
    statistics, never interpolated — the choice that keeps the fence
    bit-deterministic across engines) and the count of rows outside
    [q1 - 1.5·IQR, q3 + 1.5·IQR].  One Exchange on the group keys
    serves ranking, quartile broadcast-back, and the final aggregate.
    The oracle recomputes the same order statistics and fences
    independently."""
    o = load_tables(spark, sf_dir)["orders"]
    out = iqr_outlier_screen(
        o, "o_totalprice", ["o_orderpriority"], "o_orderkey", k=1.5
    )
    return out.select(
        "o_orderpriority",
        F.round("q1", 2).alias("q1"),
        F.round("q3", 2).alias("q3"),
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "n_rows",
        "n_outliers",
    )
