"""Relational operator queries (SURVEY §2.1-§2.9) with DuckDB oracles.

Each query exercises one operator family from the reference inventory,
built with the package's operator modules so the catalog doubles as an
integration test of the library.  Reference citations live in the
operator modules; here each query notes which §2 row it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_monotasks_spark.operators import aggregates, joins, setops, sort
from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


def money(c: F.Column) -> F.Column:
    """Round a currency aggregate to cents — fp-sum order differs between
    engines at the ulp level, so both dialects round identically."""
    return F.round(c, 2)


# ---------------------------------------------------------------------------
# §2.1 scans + §2.2 projection/filter
# ---------------------------------------------------------------------------

@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_extendedprice > 95000.0
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BDB Q1 shape (BigDataBenchmarkSuite.scala:82) — parquet scan with
    projection + predicate, both pushed into the scan by Catalyst."""
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_extendedprice") > 95000.0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "predicate_ops",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND (o_totalprice > 450000.0 OR o_totalprice < 2000.0)
      AND NOT (o_custkey % 10 = 3)
    """,
)
def predicate_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicates E (predicates.scala): In :94, And :123, Or :145, Not :78."""
    t = _t(spark, sf_dir)
    o = t["orders"]
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & ((F.col("o_totalprice") > 450000.0) | (F.col("o_totalprice") < 2000.0))
        & ~(F.col("o_custkey") % 10 == 3)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "between_like",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment LIKE 'FURN%'
      AND c_acctbal BETWEEN 1000.0 AND 5000.0
      AND c_name LIKE '%1%'
    """,
)
def between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like (stringOperations.scala:98) + range predicate; LIKE prefix is
    rewritten to startsWith by LikeSimplification (Optimizer.scala:192)."""
    t = _t(spark, sf_dir)
    c = t["customer"]
    return c.filter(
        F.col("c_mktsegment").like("FURN%")
        & F.col("c_acctbal").between(1000.0, 5000.0)
        & F.col("c_name").like("%1%")
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "case_when",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS discounted
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """If :322 / CaseWhen :366 (predicates.scala)."""
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("discounted"),
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

@register(
    "tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate w/ partial+final split (Aggregate.scala:42,
    aggregates.scala SplitEvaluation :52) — the flagship pricing summary."""
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return aggregates.group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            money(F.sum(charge)).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        ],
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey)  AS distinct_parts,
           count(DISTINCT l_suppkey)  AS distinct_supps,
           round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty
    FROM lineitem
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountDistinct (aggregates.scala:169) + SumDistinct (:371)."""
    t = _t(spark, sf_dir)
    return t["lineitem"].agg(
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count_distinct("l_suppkey").alias("distinct_supps"),
        money(F.sum_distinct(F.col("l_quantity"))).alias("sum_distinct_qty"),
    )


@register(
    "agg_minmax",
    oracle="""
    SELECT o_orderpriority,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           count(*)          AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min :93 / Max :124 (aggregates.scala) — exact, no rounding needed."""
    t = _t(spark, sf_dir)
    return aggregates.group_agg(
        t["orders"],
        ["o_orderpriority"],
        [
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count("*").alias("n_orders"),
        ],
    )


@register(
    "distinct_select",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (L basicOperators.scala:276, P :170)."""
    t = _t(spark, sf_dir)
    return aggregates.distinct(t["lineitem"].select("l_returnflag", "l_linestatus"))


@register(
    "group_having",
    oracle="""
    SELECT l_suppkey, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 100
    """,
)
def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (UnresolvedHavingClauseAttributes, Analyzer.scala:459)."""
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(
            money(F.sum("l_extendedprice")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("n_items") > 100)
    )


@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping_id(l_returnflag, l_linestatus) AS grouping_id,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube (L basicOperators.scala:231) → Expand + GROUPING__ID
    (Analyzer.scala:81 ResolveGroupingAnalytics)."""
    t = _t(spark, sf_dir)
    return aggregates.cube(
        t["lineitem"],
        ["l_returnflag", "l_linestatus"],
        [F.count("*").alias("n"), money(F.sum("l_quantity")).alias("sum_qty")],
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping_id(l_returnflag, l_linestatus) AS grouping_id,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup (L basicOperators.scala:250)."""
    t = _t(spark, sf_dir)
    return aggregates.rollup(
        t["lineitem"],
        ["l_returnflag", "l_linestatus"],
        [F.count("*").alias("n"), money(F.sum("l_quantity")).alias("sum_qty")],
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (HiveQl.scala:738 TOK_GROUPING_SETS → Expand)."""
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register("approx_distinct_parts")  # no oracle: HLL++ vs HLL estimates differ
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApproxCountDistinct (aggregates.scala:275, clearspring HLL,
    rsd=0.05).  Spark's HLL++ gives different estimates → rows-only check;
    tests assert rsd-tolerance against exact count (SURVEY §7.4.7)."""
    t = _t(spark, sf_dir)
    return t["lineitem"].agg(
        aggregates.approx_count_distinct(F.col("l_partkey")).alias("approx_parts")
    )


@register(
    "describe_stats",
    oracle="""
    SELECT count(o_totalprice)          AS n,
           round(avg(o_totalprice), 4)  AS mean_price,
           round(stddev_samp(o_totalprice), 4) AS std_price,
           min(o_totalprice)            AS min_price,
           max(o_totalprice)            AS max_price
    FROM orders
    """,
)
def describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.describe parity (DataFrame.scala:788 — count/mean/stddev/min/max)
    computed as explicit aggregates so the output schema is typed."""
    t = _t(spark, sf_dir)
    return t["orders"].agg(
        F.count("o_totalprice").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("mean_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 450000.0
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (ShuffledHashJoin.scala:33; Catalyst/AQE picks the
    physical strategy, broadcast if customer fits the threshold)."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_totalprice") > 450000.0)
    return joins.join(
        o, t["customer"], on=o.o_custkey == t["customer"].c_custkey
    ).select("o_orderkey", "c_name", "o_totalprice")


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_big_orders
    FROM customer LEFT JOIN (
        SELECT * FROM orders WHERE o_totalprice > 400000.0
    ) o ON c_custkey = o.o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashOuterJoin LeftOuter (HashOuterJoin.scala:39) — null-padded
    non-matches; count(col) skips the padding nulls."""
    t = _t(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000.0)
    c = t["customer"]
    return (
        joins.join(c, big, on=c.c_custkey == big.o_custkey, how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_big_orders
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
         RIGHT JOIN customer ON o.o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashOuterJoin RightOuter — mirror of join_left_outer."""
    t = _t(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000.0)
    c = t["customer"]
    return (
        joins.join(big, c, on=big.o_custkey == c.c_custkey, how="right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH a AS (SELECT c_custkey AS k, count(*) AS n_cust
               FROM customer WHERE c_acctbal > 8000.0 GROUP BY 1),
         b AS (SELECT o_custkey AS k, count(*) AS n_ord
               FROM orders WHERE o_totalprice > 400000.0 GROUP BY 1)
    SELECT coalesce(a.k, b.k) AS k, a.n_cust, b.n_ord
    FROM a FULL JOIN b ON a.k = b.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashOuterJoin FullOuter (HashOuterJoin.scala:39)."""
    t = _t(spark, sf_dir)
    a = (
        t["customer"]
        .filter(F.col("c_acctbal") > 8000.0)
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    b = (
        t["orders"]
        .filter(F.col("o_totalprice") > 400000.0)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_ord"))
    )
    joined = joins.join(a, b, on=a.k == b.k, how="full")
    return joined.select(
        F.coalesce(a.k, b.k).alias("k"), "n_cust", "n_ord"
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 480000.0)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftSemiJoinHash (LeftSemiJoinHash.scala:32): EXISTS, right dedup'd."""
    t = _t(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 480000.0)
    c = t["customer"]
    return joins.semi_join(c, big, on=c.c_custkey == big.o_custkey).select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 480000.0)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — the reference reached this via EXCEPT/subtract
    (SURVEY §2.3 'Not present'); declarative left_anti is the twin."""
    t = _t(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 480000.0)
    c = t["customer"]
    return joins.anti_join(c, big, on=c.c_custkey == big.o_custkey).select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CartesianProduct (CartesianProduct.scala:30) — bounded dims only."""
    t = _t(spark, sf_dir)
    return joins.cross_join(
        t["region"].select("r_name"), t["nation"].select("n_name")
    )


@register(
    "join_theta",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (CartesianProduct + filter / BroadcastNestedLoopJoin,
    SparkStrategies.scala:188) — same-region nation pairs."""
    t = _t(spark, sf_dir)
    a = t["nation"].alias("a")
    b = t["nation"].alias("b")
    cond = (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (
        F.col("a.n_nationkey") < F.col("b.n_nationkey")
    )
    return joins.theta_join(a, b, cond).select(
        F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2")
    )


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, round(sum(s_acctbal), 2) AS total_bal, count(*) AS n_supp
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BroadcastHashJoin (BroadcastHashJoin.scala:39): bounded dims
    broadcast explicitly — at 100 TB supplier shuffles zero bytes here."""
    t = _t(spark, sf_dir)
    s = joins.broadcast_join(
        t["supplier"], t["nation"], on=F.col("s_nationkey") == F.col("n_nationkey")
    )
    s = joins.broadcast_join(
        s, t["region"], on=F.col("n_regionkey") == F.col("r_regionkey")
    )
    return s.groupBy("r_name").agg(
        money(F.sum("s_acctbal")).alias("total_bal"),
        F.count("*").alias("n_supp"),
    )


@register(
    "tpch_q3_shipping",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k (BDB Q3 shape, BigDataBenchmarkSuite.scala:105):
    TakeOrderedAndProject bounds the sort at k (basicOperators.scala:121)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz")
    )
    joined = joins.join(c, o, on=c.c_custkey == o.o_custkey).join(
        li, on=F.col("o_orderkey") == li.l_orderkey
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )
    return sort.top_k(
        agg, 10, F.col("revenue").desc(), F.col("o_orderkey")
    ).select("o_orderkey", "revenue", "o_orderdate")


@register(
    "tpch_q5_region_revenue",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join (5 tables): bounded dims broadcast, fact-fact joins
    shuffle on keys, AQE reorders/broadcasts at runtime (SURVEY §4)."""
    t = _t(spark, sf_dir)
    r = t["region"].filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = joins.broadcast_join(
        t["nation"], r, on=F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = joins.broadcast_join(
        t["customer"], n, on=F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = joins.join(t["orders"], c, on=F.col("o_custkey") == F.col("c_custkey"))
    li = joins.join(t["lineitem"], o, on=F.col("l_orderkey") == F.col("o_orderkey"))
    s = t["supplier"]
    li = joins.join(
        li,
        s,
        on=(F.col("s_suppkey") == F.col("l_suppkey"))
        & (F.col("s_nationkey") == F.col("c_nationkey")),
    )
    return li.groupBy("n_name").agg(
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


@register(
    "bdb_q2_substr_agg",
    oracle="""
    SELECT substring(c_name, 1, 12) AS prefix, round(sum(c_acctbal), 2) AS total
    FROM customer GROUP BY substring(c_name, 1, 12)
    """,
)
def bdb_q2_substr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BDB Q2 shape (BigDataBenchmarkSuite.scala:90): SUBSTR group-by sum."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .groupBy(F.substring("c_name", 1, 12).alias("prefix"))
        .agg(money(F.sum("c_acctbal")).alias("total"))
    )


# ---------------------------------------------------------------------------
# §2.6 sort/limit/top-k
# ---------------------------------------------------------------------------

@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TakeOrdered (basicOperators.scala:121): bounded priority queue per
    partition, no global sort; o_orderkey tiebreaker for determinism."""
    t = _t(spark, sf_dir)
    return sort.top_k(
        t["orders"].select("o_orderkey", "o_totalprice"),
        25,
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )


@register(
    "order_by_multi",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag ASC, l_linestatus DESC
    """,
)
def order_by_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (Sort + RangePartitioning Exchange, Exchange.scala:65);
    asc/desc mix (SortOrder.scala:32)."""
    t = _t(spark, sf_dir)
    agg = t["lineitem"].groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n")
    )
    return sort.order_by(agg, F.col("l_returnflag").asc(), F.col("l_linestatus").desc())


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------

@register(
    "union_all_op",
    oracle="""
    SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_extendedprice > 100000.0
    UNION ALL
    SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_extendedprice < 1000.0
    """,
)
def union_all_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — df.unionAll (basicOperators.scala:77)."""
    t = _t(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_extendedprice")
    return setops.union_all(
        li.filter(F.col("l_extendedprice") > 100000.0),
        li.filter(F.col("l_extendedprice") < 1000.0),
    )


@register(
    "union_distinct_op",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem
    UNION
    SELECT o_orderstatus AS flag FROM orders
    """,
)
def union_distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION = Distinct(Union) (SqlParser.scala:127)."""
    t = _t(spark, sf_dir)
    return setops.union_distinct(
        t["lineitem"].select(F.col("l_returnflag").alias("flag")),
        t["orders"].select(F.col("o_orderstatus").alias("flag")),
    )


@register(
    "intersect_op",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
    INTERSECT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
    """,
)
def intersect_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect — set semantics (basicOperators.scala:214 → RDD.intersection)."""
    t = _t(spark, sf_dir)
    return setops.intersect(
        t["orders"].filter(F.col("o_totalprice") > 400000.0).select(
            F.col("o_custkey").alias("k")
        ),
        t["customer"].filter(F.col("c_acctbal") > 5000.0).select(
            F.col("c_custkey").alias("k")
        ),
    )


@register(
    "except_distinct_op",
    oracle="""
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
    """,
)
def except_distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI EXCEPT (distinct) — the facade's except_distinct."""
    t = _t(spark, sf_dir)
    return setops.except_distinct(
        t["customer"].filter(F.col("c_acctbal") > 5000.0).select(
            F.col("c_custkey").alias("k")
        ),
        t["orders"].filter(F.col("o_totalprice") > 400000.0).select(
            F.col("o_custkey").alias("k")
        ),
    )


@register(
    "except_reference_op",
    oracle="""
    SELECT l_returnflag AS v FROM lineitem
    WHERE l_returnflag NOT IN (SELECT o_orderstatus FROM orders)
    """,
)
def except_reference_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hybrid EXCEPT (SubtractedRDD.scala:143-145): drops
    all right-matching rows but KEEPS duplicates of survivors — oracle is
    NOT IN (null-free columns), which has identical bag semantics."""
    t = _t(spark, sf_dir)
    return setops.except_reference(
        t["lineitem"].select(F.col("l_returnflag").alias("v")),
        t["orders"].select(F.col("o_orderstatus").alias("v")),
    )


# ---------------------------------------------------------------------------
# §2.8 scalar functions / casts / generators
# ---------------------------------------------------------------------------

@register(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS uname,
           lower(c_mktsegment)                   AS lseg,
           substring(c_name, 10, 5)              AS frag,
           length(c_name)                        AS name_len,
           concat(c_mktsegment, '_', c_name)     AS tag,
           CASE WHEN contains(c_name, '42') THEN 1 ELSE 0 END AS has42
    FROM customer WHERE c_name LIKE '%9'
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stringOperations.scala: Upper :140, Lower :150, Substring :211,
    Contains :186; concat/length via Hive builtins (SURVEY §2.8)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_name").like("%9"))
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 5).alias("frag"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("_"), F.col("c_name")).alias("tag"),
        F.when(F.col("c_name").contains("42"), 1).otherwise(0).alias("has42"),
    )


@register(
    "null_funcs",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
           CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END AS was_open
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullFunctions.scala: Coalesce :24, IsNull :57 (nulls synthesized
    via nullif since the test tables are null-free)."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") % 100 == 0)
    status2 = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
    )
    return o.select(
        "o_orderkey",
        status2.alias("status2"),
        F.when(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull(), 1)
        .otherwise(0)
        .alias("was_open"),
    )


@register(
    "arithmetic_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge,
           l_quantity % 7                   AS qmod,
           abs(l_discount - 0.05)           AS absdisc,
           round(sqrt(l_extendedprice), 6)  AS sq,
           l_linenumber / 2                 AS half,
           l_orderkey & 255                 AS keymask
    FROM lineitem WHERE l_orderkey % 500 = 0
    """,
)
def arithmetic_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arithmetic.scala: Add/Subtract/Multiply/Divide/Remainder/Abs/Sqrt/
    BitwiseAnd.  `l_linenumber / 2` pins the reference's int÷int→double
    coercion (HiveTypeCoercion.scala:530; spark.sql.ansi.enabled=false)."""
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_orderkey") % 500 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") % 7).alias("qmod"),
        F.abs(F.col("l_discount") - 0.05).alias("absdisc"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        (F.col("l_linenumber") / 2).alias("half"),
        F.col("l_orderkey").bitwiseAND(255).alias("keymask"),
    )


@register(
    "cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderkey AS VARCHAR)         AS key_str,
           strftime(o_orderdate, '%Y-%m-%d')   AS date_str,
           CAST('123' AS INT)                  AS lit_int,
           CAST(o_orderkey % 2 = 0 AS INT)     AS even_flag
    FROM orders WHERE o_orderkey % 250 = 0
    """,
)
def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast.scala:28 matrix: double→long (via floor — DuckDB rounds on
    plain cast, Spark truncates, so both floor first), long→string,
    timestamp→formatted string, string→int, boolean→int."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") % 250 == 0)
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.lit("123").cast("int").alias("lit_int"),
        (F.col("o_orderkey") % 2 == 0).cast("int").alias("even_flag"),
    )


@register(
    "datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)    AS yr,
           month(o_orderdate)   AS mo,
           day(o_orderdate)     AS dom,
           quarter(o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
    FROM orders WHERE o_orderkey % 250 = 0
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions — absent natively in the reference, reached via Hive
    builtins (SURVEY §2.8 note); mapped to F.* (functions/registry.py)."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") % 250 == 0)
    # extracts cast to long: DuckDB's year()/datediff() return BIGINT,
    # and the driver compares schemas, not just values
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("long").alias("days_since"),
    )


@register(
    "explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generators (generators.scala: Explode :98; LATERAL VIEW
    HiveQl.scala:799; DataFrame.explode :712)."""
    t = _t(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") % 10 == 0)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@register(
    "explode_pos",
    oracle="""
    SELECT doc_id,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — UserDefinedGenerator shape (generators.scala:79);
    1-based pos (DuckDB zips parallel unnests)."""
    t = _t(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") % 25 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", (F.col("pos") + 1).cast("bigint").alias("pos"), "token")


@register(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events WHERE event_type = 'click'
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar access — Hive builtin get_json_object surface."""
    t = _t(spark, sf_dir)
    e = t["events"].filter(F.col("event_type") == "click")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register("sample_fraction")  # no oracle: seed semantics are engine-specific
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample (basicOperators.scala:62, DataFrame.scala:676) — Bernoulli
    sample, fixed seed.  Cardinality-checked in tests (SURVEY §7.4.11)."""
    from spark_monotasks_spark.operators import sample as sample_ops

    t = _t(spark, sf_dir)
    return sample_ops.sample(t["lineitem"], fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# window functions (beyond-reference bonus — Spark 1.3 lacked them, §2.5)
# ---------------------------------------------------------------------------

@register(
    "window_topn_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC,
                                           l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[beyond-reference] row_number() top-N per key — the scalable
    'top-k per group' pattern (single shuffle on the partition key)."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        t["lineitem"]
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders WHERE o_custkey % 20 = 0
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[beyond-reference] running total per customer."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") % 20 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            money(F.sum("o_totalprice").over(w)).alias("running_total"),
        )
    )


# ---------------------------------------------------------------------------
# events (micro-batch-shaped analytics; streaming twin lives in streaming/)
# ---------------------------------------------------------------------------

@register(
    "events_hourly_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time window (DStream window → F.window, SURVEY §2.10) on
    the batch table; the streaming module runs the same agg incrementally."""
    t = _t(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), money(F.sum("value")).alias("total_value"))
    )


@register(
    "except_all_op",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_all_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with multiplicities (a customer with
    3 qualifying orders and 1 subtracted keeps 2 rows), completing the
    §2.7 set-op family beyond the distinct and reference-hybrid forms."""
    t = _t(spark, sf_dir)
    return setops.except_all(
        t["orders"].filter(F.col("o_totalprice") > 100000.0).select(
            F.col("o_custkey").alias("k")
        ),
        t["orders"].filter(F.col("o_orderstatus") == "F").select(
            F.col("o_custkey").alias("k")
        ),
    )


@register(
    "intersect_all_op",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_all_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min of the two multiplicities
    per value), the other half of the bag-semantics pair."""
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_totalprice") > 100000.0)
        .select(F.col("o_custkey").alias("k"))
        .intersectAll(
            t["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .select(F.col("o_custkey").alias("k"))
        )
    )
