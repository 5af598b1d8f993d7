"""Catalog entries for the coverage tail: TRANSFORM scripts, graph
algorithms, NA functions, first/last aggregates, complex types,
zipWithIndex (SURVEY §2.9 / §2.11 / §2.12).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_monotasks_spark.graph import connected_components, pagerank
from spark_monotasks_spark.operators import sample as sample_ops
from spark_monotasks_spark.operators.transform import script_transform
from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


# --- SELECT TRANSFORM (script) — SURVEY §2.11, BDB Q4 shape ---------------

#: stdin: doc_id \t text — stdout: doc_id \t token, one line per token.
#: Mirrors the reference's url_count.py UDTF-shaped script
#: (BigDataBenchmarkSuite.scala:105-121).
_TOKENIZE_SCRIPT = (
    "import sys\n"
    "for line in sys.stdin:\n"
    "    doc_id, text = line.rstrip('\\n').split('\\t', 1)\n"
    "    for tok in text.split(' '):\n"
    "        if tok:\n"
    "            print(f'{doc_id}\\t{tok}')\n"
)


@register(
    "bdb_q4_transform",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != ''))
            AS token
          FROM documents)
    GROUP BY token HAVING count(*) >= 50
    """,
)
def bdb_q4_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BDB Q4 (BigDataBenchmarkSuite.scala:105-121): TRANSFORM rows
    through an external script (ScriptTransformation.scala:67 — here one
    process per partition over mapInPandas), then aggregate the script's
    output.  The script is the distributed token generator; the groupBy
    is a plain shuffled count."""
    t = _t(spark, sf_dir)
    toks = script_transform(
        t["documents"],
        [sys.executable, "-c", _TOKENIZE_SCRIPT],
        "doc_id long, token string",
        input_cols=["doc_id", "text"],
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 50)
    )


# --- graph algorithms — SURVEY §2.12 --------------------------------------

def _nation_coregion_edges(t: dict[str, DataFrame]) -> DataFrame:
    """Undirected edges between nations sharing a region (a < b)."""
    a = t["nation"].select(
        F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r")
    )
    b = t["nation"].select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r")
    )
    return a.join(b, on="r").filter(F.col("src") < F.col("dst")).select("src", "dst")


@register(
    "graph_connected_components",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS id,
           CAST(min(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT)
             AS component
    FROM nation
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConnectedComponents (graphx lib/ConnectedComponents.scala) via
    min-label propagation on DataFrames.  Co-region nation cliques make
    the exact answer SQL-expressible: component = min nationkey in the
    region."""
    t = _t(spark, sf_dir)
    edges = _nation_coregion_edges(t).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    return connected_components(edges)


@register("graph_pagerank")  # iterative float fixpoint — rows-only; exact
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:  # invariants in tests
    """Static PageRank (graphx lib/PageRank.scala) over the
    supplier→customer shipment graph (edge = supplier shipped a
    lineitem on a customer's order).  Supplier ids are offset by 10^7 so
    the two key spaces can't collide in one vertex-id domain."""
    t = _t(spark, sf_dir)
    edges = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .select(
            (F.col("l_suppkey") + 10_000_000).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, num_iters=5)


@register("ml_kmeans_clusters")  # iterative float fixpoint — rows-only
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib parity proof (SURVEY §2.12, mllib clustering/KMeans.scala):
    k-means over the embeddings table; cluster sizes, not centroids, are
    the stable observable."""
    from spark_monotasks_spark.ml import kmeans_fit_predict

    t = _t(spark, sf_dir)
    clustered = kmeans_fit_predict(t["embeddings"], k=8, max_iter=10)
    return clustered.groupBy("cluster").agg(F.count("*").alias("n_vecs"))


# --- NA functions — SURVEY §2.9 -------------------------------------------

@register(
    "na_fill_drop",
    oracle="""
    WITH x AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
                  ELSE c_mktsegment END AS seg
      FROM customer
    )
    SELECT c_custkey, coalesce(bal, 0.0) AS bal, seg
    FROM x WHERE NOT (bal IS NULL AND seg IS NULL)
    """,
)
def na_fill_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions (DataFrameNaFunctions.scala: drop :40-101,
    fill :110+): synthesize nulls, drop rows where ALL of the subset is
    null, fill the numeric remainder."""
    t = _t(spark, sf_dir)
    x = t["customer"].select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
        F.when(F.col("c_mktsegment") == "MACHINERY", None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    dropped = sample_ops.na_drop(x, how="all", subset=["bal", "seg"])
    return sample_ops.na_fill(dropped, {"bal": 0.0})


@register(
    "na_replace",
    oracle="""
    SELECT c_custkey,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'CAR'
                             WHEN 'HOUSEHOLD' THEN 'HOME'
                             ELSE c_mktsegment END AS seg
    FROM customer
    """,
)
def na_replace_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions.replace — value remapping."""
    t = _t(spark, sf_dir)
    out = sample_ops.na_replace(
        t["customer"].select("c_custkey", F.col("c_mktsegment").alias("seg")),
        {"AUTOMOBILE": "CAR", "HOUSEHOLD": "HOME"},
        None,
        subset=["seg"],
    )
    return out


# --- first/last aggregates — SURVEY §2.4 / §7.4.6 -------------------------

@register(
    "first_last_agg",
    oracle="""
    SELECT o_custkey,
           arg_min(o_totalprice, o_orderkey) AS first_price,
           arg_max(o_totalprice, o_orderkey) AS last_price,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def first_last_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/Last aggregates (aggregates.scala:437,:451) are
    partition-order-dependent in the reference; the deterministic
    equivalent is arg-min/arg-max over the unique orderkey
    (min_by/max_by), which is what ordered-input first/last computes."""
    t = _t(spark, sf_dir)
    return t["orders"].groupBy("o_custkey").agg(
        F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_price"),
        F.count("*").alias("n_orders"),
    )


# --- complex types — SURVEY §2.8 (complexTypes.scala) ---------------------

@register(
    "complex_types_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity  AS qty_from_array,
           l_extendedprice AS price_from_struct,
           l_discount  AS disc_from_map,
           2 AS arr_size
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def complex_types_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CreateArray/GetItem/StructGetField/map access
    (complexTypes.scala: GetItem :27, StructGetField :87, CreateArray
    :120): build array/struct/map, extract back — all JVM-side."""
    t = _t(spark, sf_dir)
    built = t["lineitem"].filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        F.array("l_quantity", "l_extendedprice").alias("arr"),
        F.struct("l_extendedprice", "l_discount").alias("st"),
        F.create_map(F.lit("disc"), F.col("l_discount")).alias("mp"),
    )
    return built.select(
        "l_orderkey",
        "l_linenumber",
        built.arr[0].alias("qty_from_array"),
        built.st.l_extendedprice.alias("price_from_struct"),
        built.mp["disc"].alias("disc_from_map"),
        F.size("arr").alias("arr_size"),
    )


# --- zipWithIndex — SURVEY §2.9 -------------------------------------------

@register(
    "zip_with_index",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
    FROM orders
    """,
)
def zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zipWithIndex (RDD.scala:1371) — deterministic variant: index by
    a total order, not partition arrival.  row_number over a window is
    the scalable form (monotonically_increasing_id gives the
    partition-local non-contiguous equivalent)."""
    t = _t(spark, sf_dir)
    w = Window.orderBy("o_orderkey")
    return t["orders"].select(
        "o_orderkey", (F.row_number().over(w) - 1).cast("long").alias("idx")
    )
