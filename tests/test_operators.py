"""Operator-level semantics tests, modeled on the reference's unit
suites (SURVEY §5: TestData.scala fixtures + checkAnswer pattern).

The fixtures reproduce FIXTURES.md §B verbatim where exercised; the
assertions pin the reference's semantic deltas (SURVEY §7.4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_monotasks_spark.functions.registry import resolve_function
from spark_monotasks_spark.operators import aggregates, joins, sample, setops, sort


@pytest.fixture(scope="module")
def test_data2(spark):
    # TestData.scala:  (1,1),(1,2),(2,1),(2,2),(3,1),(3,2)
    return spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)], "a int, b int"
    )


@pytest.fixture(scope="module")
def upper_lower(spark):
    upper = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "D"), (5, "E"), (6, "F")], "N int, L string"
    )
    lower = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "n int, l string"
    )
    return upper, lower


@pytest.fixture(scope="module")
def null_ints(spark):
    return spark.createDataFrame([(1,), (2,), (3,), (None,)], "a int")


# --- joins (§2.3) ----------------------------------------------------------

def test_outer_join_asymmetry(spark, upper_lower):
    upper, lower = upper_lower
    cond = upper.N == lower.n
    left = joins.join(upper, lower, cond, "left").collect()
    assert len(left) == 6
    assert sum(1 for r in left if r.l is None) == 2  # E,F unmatched
    right = joins.join(lower, upper, lower.n == upper.N, "right").collect()
    assert len(right) == 6
    full = joins.join(upper, lower, cond, "full").collect()
    assert len(full) == 6  # all lower keys exist in upper


def test_semi_anti(spark, upper_lower):
    upper, lower = upper_lower
    semi = joins.semi_join(upper, lower, upper.N == lower.n)
    assert sorted(r.N for r in semi.collect()) == [1, 2, 3, 4]
    assert semi.columns == ["N", "L"]  # right columns dropped
    anti = joins.anti_join(upper, lower, upper.N == lower.n)
    assert sorted(r.N for r in anti.collect()) == [5, 6]


def test_semi_join_no_duplication(spark):
    left = spark.createDataFrame([(1,)], "k int")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string")
    # LeftSemiJoinHash dedups the right side (LeftSemiJoinHash.scala:32)
    assert joins.semi_join(left, right, "k").count() == 1


def test_cross_and_theta(spark, test_data2):
    assert joins.cross_join(test_data2, test_data2).count() == 36
    theta = joins.theta_join(
        test_data2.alias("x"),
        test_data2.alias("y"),
        F.col("x.a") < F.col("y.a"),
    )
    # a-value pairs (1,2),(1,3),(2,3), 2 rows per a-value → 3 × 2×2 = 12
    assert theta.count() == 12


def test_salted_join_matches_plain(spark, test_data2):
    other = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "a int, v string")
    plain = sorted(
        (r.a, r.b, r.v) for r in joins.join(test_data2, other, "a").collect()
    )
    salted = sorted(
        (r.a, r.b, r.v)
        for r in joins.salted_join(test_data2, other, "a", salt_buckets=4).collect()
    )
    assert plain == salted


# --- set ops (§2.7 + §7.4.3/4) --------------------------------------------

def test_union_bag_vs_distinct(spark, test_data2):
    assert setops.union_all(test_data2, test_data2).count() == 12
    assert setops.union_distinct(test_data2, test_data2).count() == 6


def test_intersect_set_semantics(spark):
    l = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    r = spark.createDataFrame([(1,), (3,)], "v int")
    # RDD.intersection dedups (RDD.scala:744)
    assert [r_.v for r_ in setops.intersect(l, r).collect()] == [1]


def test_except_reference_hybrid(spark):
    l = spark.createDataFrame([(1,), (1,), (2,), (3,)], "v int")
    r = spark.createDataFrame([(2,), (2,)], "v int")
    # SubtractedRDD.scala:143-145: drop ALL right-matches, keep dup survivors
    assert sorted(x.v for x in setops.except_reference(l, r).collect()) == [1, 1, 3]
    assert sorted(x.v for x in setops.except_distinct(l, r).collect()) == [1, 3]
    assert sorted(x.v for x in setops.except_all(l, r).collect()) == [1, 1, 3]


def test_subtract_by_key(spark):
    l = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    r = spark.createDataFrame([(1, "zzz")], "k int, v string")
    assert [x.v for x in setops.subtract_by_key(l, r, "k").collect()] == ["c"]


# --- aggregates (§2.4) -----------------------------------------------------

def test_cube_rollup_shapes(spark, test_data2):
    cube = aggregates.cube(test_data2, ["a", "b"], [F.count("*").alias("n")])
    # 2^2 grouping sets: (a,b)=6 rows, (a)=3, (b)=2, ()=1 → 12
    assert cube.count() == 12
    gid = {r.grouping_id for r in cube.collect()}
    assert gid == {0, 1, 2, 3}
    rollup = aggregates.rollup(test_data2, ["a", "b"], [F.count("*").alias("n")])
    assert rollup.count() == 10  # (a,b)+(a)+() = 6+3+1
    total = [r for r in rollup.collect() if r.grouping_id == 3]
    assert len(total) == 1 and total[0].n == 6


def test_approx_count_distinct_tolerance(spark, tables):
    li = tables["lineitem"]
    exact = li.select(F.count_distinct("l_partkey")).first()[0]
    approx = li.select(
        aggregates.approx_count_distinct(F.col("l_partkey"), rsd=0.05)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.15  # 3×rsd guard band


def test_grouping_sets_sql_builder(spark, test_data2):
    test_data2.createOrReplaceTempView("td2")
    q = aggregates.grouping_sets_sql(
        "td2", ["a", "b"], [["a"], ["b"]], "count(*) AS n"
    )
    assert spark.sql(q).count() == 5  # 3 a-groups + 2 b-groups


def test_describe(spark, test_data2):
    d = aggregates.describe(test_data2, "a")
    stats = {r.summary: r.a for r in d.collect()}
    assert stats["count"] == "6" and stats["min"] == "1" and stats["max"] == "3"


# --- sort / limit (§2.6 + §7.4.5) -----------------------------------------

def test_top_k(spark, test_data2):
    top = sort.top_k(test_data2, 2, F.col("a").desc(), F.col("b").desc()).collect()
    assert [(r.a, r.b) for r in top] == [(3, 2), (3, 1)]


def test_null_ordering_nulls_first_asc(spark, null_ints):
    # SortOrder.scala:32 — nulls first on ascending
    got = [r.a for r in sort.order_by(null_ints, F.col("a").asc()).collect()]
    assert got == [None, 1, 2, 3]


def test_sort_within_partitions_preserves_rows(spark, test_data2):
    got = sort.sort_within_partitions(
        sort.repartition(test_data2, 2, F.col("a")), F.col("b")
    )
    assert got.count() == 6
    assert sorted((r.a, r.b) for r in got.collect()) == sorted(
        (r.a, r.b) for r in test_data2.collect()
    )


# --- sample / na (§2.9) ----------------------------------------------------

def test_sample_cardinality(spark, tables):
    li = tables["lineitem"]
    n = li.count()
    s = sample.sample(li, fraction=0.1, seed=42).count()
    assert 0.05 * n < s < 0.15 * n


def test_random_split_partition(spark, tables):
    li = tables["lineitem"]
    a, b = sample.random_split(li, [0.5, 0.5], seed=7)
    assert a.count() + b.count() == li.count()


def test_na_funcs(spark):
    df = spark.createDataFrame(
        [(1, None), (None, "x"), (3, "y")], "a int, s string"
    )
    assert sample.na_drop(df).count() == 1
    assert sample.na_drop(df, subset=["a"]).count() == 2
    filled = sample.na_fill(df, 0, subset=["a"]).collect()
    assert sorted(r.a for r in filled) == [0, 1, 3]
    rep = sample.na_replace(df, "x", "z", subset=["s"]).collect()
    assert "z" in {r.s for r in rep}


# --- reference semantic deltas (§7.4) --------------------------------------

def test_int_division_coerces_to_double(spark):
    # HiveTypeCoercion.scala:530 (ansi off pins this)
    row = spark.sql("SELECT 1/2 AS d, 7%3 AS m").first()
    assert row.d == 0.5 and row.m == 1


def test_string_number_promotion(spark):
    # PromoteStrings (HiveTypeCoercion.scala:230): '1' + 1 works
    assert spark.sql("SELECT '1' + 1 AS v").first().v == 2.0


def test_invalid_cast_yields_null_not_error(spark):
    # Cast.scala lenient matrix (ANSI would throw)
    assert spark.sql("SELECT CAST('abc' AS INT) AS v").first().v is None


def test_eqnullsafe(spark):
    df = spark.createDataFrame([(None,), (1,)], "a int")
    got = df.select(F.col("a").eqNullSafe(F.lit(None)).alias("x")).collect()
    assert [r.x for r in got] == [True, False]


# --- function registry (§2.8) ----------------------------------------------

def test_registry_resolves_hive_names(spark):
    upper = resolve_function("UCASE")
    df = spark.createDataFrame([("ab",)], "s string")
    assert df.select(upper("s").alias("u")).first().u == "AB"
    iff = resolve_function("if")
    assert (
        df.select(iff(F.lit(True), F.lit(1), F.lit(2)).alias("v")).first().v == 1
    )
    with pytest.raises(KeyError):
        resolve_function("definitely_not_a_function")


def test_registry_url_xml_map_names(spark):
    """parse_url / xpath* / str_to_map reached by Hive-era name
    (HiveCompatibilitySuite udf_parse_url, udf_xpath*)."""
    df = spark.createDataFrame(
        [("https://h.example/p?a=1", "<r><v>7</v></r>", "a:1,b:2")],
        "url string, xml string, kv string",
    )
    purl = resolve_function("parse_url")
    assert df.select(purl("url", F.lit("HOST")).alias("h")).first().h == "h.example"
    xint = resolve_function("XPATH_INT")
    assert df.select(xint("xml", F.lit("/r/v")).alias("v")).first().v == 7
    s2m = resolve_function("str_to_map")
    got = df.select(
        s2m("kv", F.lit(","), F.lit(":")).getItem("b").alias("b")
    ).first()
    assert got.b == "2"


def test_registry_date_functions(spark):
    df = spark.createDataFrame([Row(d="2024-03-15")]).select(
        F.col("d").cast("date").alias("d")
    )
    year = resolve_function("year")
    assert df.select(year("d").alias("y")).first().y == 2024


# --- cogroup (SURVEY §2.3 RDD-level) --------------------------------------

def test_cogroup_apply_per_key(spark):
    import pandas as pd
    from spark_monotasks_spark.operators.cogroup import cogroup_apply

    left = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    right = spark.createDataFrame([(1, 100.0), (3, 7.0)], "k long, w double")

    def fn(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        k = lg["k"].iloc[0] if len(lg) else rg["k"].iloc[0]
        return pd.DataFrame(
            {"k": [k], "sum_left": [float(lg["v"].sum())], "n_right": [len(rg)]}
        )

    got = {
        r.k: (r.sum_left, r.n_right)
        for r in cogroup_apply(
            left, right, ["k"], fn, "k long, sum_left double, n_right long"
        ).collect()
    }
    # key 1: both sides; key 2: left only; key 3: right only (empty left)
    assert got == {1: (30.0, 1), 2: (5.0, 0), 3: (0.0, 1)}


def test_cogroup_collect_values(spark):
    from spark_monotasks_spark.operators.cogroup import cogroup_collect

    left = spark.createDataFrame([(1, "b"), (1, "a")], "k long, v string")
    right = spark.createDataFrame([(2, "z")], "k long, w string")
    got = {
        r.k: (r.left_values, r.right_values)
        for r in cogroup_collect(left, right, ["k"], "v", "w").collect()
    }
    assert got == {1: (["a", "b"], []), 2: ([], ["z"])}


def test_salted_join_matches_plain_join(spark):
    from spark_monotasks_spark.operators.joins import salted_join

    # skewed left: one hot key (0) with many rows
    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k) for k in range(1, 5)],
        "k long, v long",
    )
    right = spark.createDataFrame([(k, k * 10) for k in range(5)], "k long, w long")
    got = salted_join(left, right, on="k", salt_buckets=8)
    plain = left.join(right, on="k")
    assert got.count() == plain.count() == 504
    assert (
        got.agg(F.sum(F.col("v") * F.col("w")).alias("s")).first().s
        == plain.agg(F.sum(F.col("v") * F.col("w")).alias("s")).first().s
    )


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest
    from spark_monotasks_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with _pytest.raises(ValueError, match="inner/left only"):
        salted_join(df, df, on="k", how="full")


def test_cogroup_collect_null_keys_and_values(spark):
    from spark_monotasks_spark.operators.cogroup import cogroup_collect

    left = spark.createDataFrame(
        [(None, "x"), (1, None), (1, "a")], "k int, v string"
    )
    right = spark.createDataFrame([(None, "y")], "k int, w string")
    got = {
        r.k: (r.left_values, r.right_values)
        for r in cogroup_collect(left, right, ["k"], "v", "w").collect()
    }
    # NULL keys hash to ONE group (reference CoGroupedRDD), and NULL
    # values survive in the lists
    assert got[None] == (["x"], ["y"])
    assert sorted(got[1][0], key=lambda x: (x is None, x)) == ["a", None]


# --- as-of join (beyond-reference, operators/asof.py) ----------------------

def test_asof_join_hand_computed(spark):
    from spark_monotasks_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 10, "lx")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (3, 1, 999.0)],
        "k long, ts long, v double",
    )
    got = {
        r.tag: (r.v_r, r.ts_r)
        for r in as_of_join(left, right, on="k").collect()
    }
    assert got["l0"] == (None, None)      # nothing at-or-before ts=5
    assert got["l1"] == (100.0, 10)       # tie: inclusive >= matches
    assert got["l2"] == (150.0, 15)       # latest of the two priors
    assert got["lx"] == (None, None)      # key 2 has no right rows


def test_asof_join_single_shuffle_plan(spark):
    """The union-window formulation must cost ONE hash partitioning on
    the key — never a range cross product (BroadcastNestedLoop /
    Cartesian)."""
    from spark_monotasks_spark.operators.asof import as_of_join

    left = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(50).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    df = as_of_join(left, right, on="k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_hand_computed(spark):
    from spark_monotasks_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 25, "c"), (2, 10, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 0, 10, "i1"), (1, 8, 12, "i2"), (2, 50, 60, "i3")],
        "k long, start long, end long, iv string",
    )
    got = sorted(
        (r.tag, r.iv)
        for r in range_join(left, right, on="k", bucket_width=7).collect()
    )
    # a∈[0,10]; b∈[0,10] AND [8,12] (inclusive ends); c,d match nothing
    assert got == [("a", "i1"), ("b", "i1"), ("b", "i2")]
    # derived bucket width gives identical matches
    auto = sorted(
        (r.tag, r.iv) for r in range_join(left, right, on="k").collect()
    )
    assert auto == got


def test_range_join_equi_plan_no_nested_loop(spark):
    from spark_monotasks_spark.operators.asof import range_join

    left = spark.range(200).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 10).alias("start"),
        (F.col("id") * 10 + 15).alias("end"),
    )
    df = range_join(left, right, on="k", bucket_width=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # the join itself must be a hash/sort-merge EQUI join on (k, bucket)
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan


def test_salted_agg_matches_plain(spark):
    from spark_monotasks_spark.operators.aggregates import salted_agg

    df = spark.createDataFrame(
        [(k, v * 1.0) for k in ("a", "a", "a", "b") for v in range(5)],
        "k string, v double",
    )
    got = {
        r.k: (r.n, r.s, r.mn, r.mx, round(r.av, 9))
        for r in salted_agg(
            df,
            keys=["k"],
            spec={
                "n": ("count", "v"),
                "s": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
                "av": ("avg", "v"),
            },
            salt_buckets=4,
        ).collect()
    }
    assert got == {"a": (15, 30.0, 0.0, 4.0, 2.0), "b": (5, 10.0, 0.0, 4.0, 2.0)}


def test_salted_agg_rejects_nondecomposable(spark):
    from spark_monotasks_spark.operators.aggregates import salted_agg

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(df, keys=["k"], spec={"m": ("median", "v")})


# --- merge / CDC (operators/merge.py) --------------------------------------

def test_merge_upsert_semantics(spark):
    from spark_monotasks_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_schema_guard(spark):
    import pytest
    from spark_monotasks_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a")], "k long, s string")
    bad = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(base, bad, ["k"])


def test_merge_upsert_broadcast_plan(spark):
    from spark_monotasks_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(i, float(i)) for i in range(100)], "k long, v double")
    updates = spark.createDataFrame([(1, -1.0)], "k long, v double")
    plan = merge_upsert(base, updates, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_apply_cdc_latest_wins_and_deletes(spark):
    from spark_monotasks_spark.operators.merge import apply_cdc

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    # key 1: stale delete (seq 1) superseded by update (seq 2)
    # key 2: live delete; key 4: insert then update (seq 4 wins)
    log = spark.createDataFrame(
        [
            (1, 0.0, "D", 1),
            (1, 11.0, "U", 2),
            (2, 0.0, "D", 5),
            (4, 40.0, "I", 3),
            (4, 44.0, "U", 4),
        ],
        "k long, v double, op string, seq long",
    )
    got = {r.k: r.v for r in apply_cdc(base, log, ["k"]).collect()}
    assert got == {1: 11.0, 3: 30.0, 4: 44.0}


# --- incremental aggregate maintenance (operators/incremental.py) ----------

def test_incremental_state_merge_matches_full(spark):
    from spark_monotasks_spark.operators import incremental as inc

    full = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 7.0), ("b", -3.0), ("b", 5.0), ("c", 0.0)],
        "k string, v double",
    )
    b1 = full.filter("v <= 1.0")
    b2 = full.filter("v > 1.0")
    s = inc.incremental_refresh(
        inc.aggregate_state(b1, ["k"], ["v"]), b2, ["k"], ["v"]
    )
    got = {
        r.k: (r.v_count, r.v_sum, r.v_avg, r.v_min, r.v_max)
        for r in inc.finalize_state(s, ["k"], ["v"]).collect()
    }
    expect = {
        r.k: (r.c, r.s, r.a, r.mn, r.mx)
        for r in full.groupBy("k")
        .agg(
            F.count("v").alias("c"), F.sum("v").alias("s"), F.avg("v").alias("a"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == expect


def test_incremental_refresh_keys_only_in_delta(spark):
    from spark_monotasks_spark.operators import incremental as inc

    hist = inc.aggregate_state(
        spark.createDataFrame([("a", 1.0)], "k string, v double"), ["k"], ["v"]
    )
    delta = spark.createDataFrame([("z", 9.0), ("z", 11.0)], "k string, v double")
    out = {
        r.k: (r.v_count, r.v_sum)
        for r in inc.finalize_state(
            inc.incremental_refresh(hist, delta, ["k"], ["v"]), ["k"], ["v"]
        ).collect()
    }
    assert out == {"a": (1, 1.0), "z": (2, 20.0)}


def test_incremental_repeated_refresh_associative(spark):
    from spark_monotasks_spark.operators import incremental as inc

    rows = [(f"k{i % 3}", float(i)) for i in range(30)]
    full = spark.createDataFrame(rows, "k string, v double")
    chunks = [full.filter(f"v % 5 = {i}") for i in range(5)]
    state = inc.aggregate_state(chunks[0], ["k"], ["v"])
    for c in chunks[1:]:
        state = inc.incremental_refresh(state, c, ["k"], ["v"])
    got = {r.k: (r.v_count, r.v_sum, r.v_min, r.v_max)
           for r in inc.finalize_state(state, ["k"], ["v"]).collect()}
    expect = {r.k: (r.c, r.s, r.mn, r.mx)
              for r in full.groupBy("k").agg(
                  F.count("v").alias("c"), F.sum("v").alias("s"),
                  F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    assert got == expect


# --- event analytics (queries/events_analytics.py) -------------------------

def test_funnel_stages_monotone(spark, tables):
    from spark_monotasks_spark.queries.events_analytics import funnel_conversion
    from tests.conftest import SF_TEST_DIR

    r = funnel_conversion(spark, SF_TEST_DIR).collect()[0]
    assert r.n_view >= r.n_click_after_view >= r.n_purchase_after_click
    assert r.n_view > 0 and r.n_purchase_after_click > 0


def test_cohort_offset_zero_covers_every_user(spark, tables):
    from spark_monotasks_spark.queries.events_analytics import cohort_retention
    from tests.conftest import SF_TEST_DIR

    rows = cohort_retention(spark, SF_TEST_DIR).collect()
    n_users = tables["events"].select("user_id").distinct().count()
    # every user is active in their own week 0, so offset-0 cells sum to
    # the full user count; offsets never go negative
    assert sum(r.n_users for r in rows if r.week_offset == 0) == n_users
    assert min(r.week_offset for r in rows) == 0


# --- time-series resample + forward-fill (operators/timeseries.py) ---------

def test_resample_ffill_fills_gaps(spark):
    from spark_monotasks_spark.operators.timeseries import resample_ffill

    rows = [
        # key "a": obs at hour 0 and hour 3 → hours 1,2 forward-filled
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 03:20:00", 9.0),
        # key "b": two obs in the SAME bucket → last write (later ts) wins
        ("b", "2024-01-01 00:00:01", 5.0),
        ("b", "2024-01-01 00:59:59", 6.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = resample_ffill(df, "k", "ts", "v", step_seconds=3600).collect()
    a = sorted([(r.bucket_ts, r.value, r.filled) for r in out if r.key == "a"])
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert a == [
        (base, 1.0, False),
        (base + 3600, 1.0, True),
        (base + 7200, 1.0, True),
        (base + 10800, 9.0, False),
    ]
    b = [(r.bucket_ts, r.value, r.filled) for r in out if r.key == "b"]
    assert b == [(base, 6.0, False)]  # last write wins, single bucket


# --- z-order layout (operators/layout.py) ----------------------------------

def test_zorder_clusters_both_dimensions(spark, tables):
    """Files sorted by the Morton key must bound BOTH columns: compare
    the mean per-chunk day-span under z-ordering vs ordering by custkey
    alone (which leaves days unclustered)."""
    from spark_monotasks_spark.operators.layout import quantize, zorder_key

    o = tables["orders"]
    sec = F.col("o_orderdate").cast("timestamp").cast("long")
    day = F.floor(sec / F.lit(86400)).cast("long")
    lo_day, hi_day = o.select(
        F.min(day), F.max(day)
    ).first()
    lo_c, hi_c = o.select(F.min("o_custkey"), F.max("o_custkey")).first()
    # equal-width quantization is the layout prerequisite (layout.py
    # docstring): interleaving raw bits lets the wider-range column
    # dominate the curve
    qa = quantize(F.col("o_custkey"), lo_c, hi_c, bits=8)
    qb = quantize(day, lo_day, hi_day, bits=8)
    keyed = o.select(
        qa.alias("a"), qb.alias("b"), zorder_key(qa, qb, bits=8).alias("zkey")
    )

    def mean_chunk_span(df, order_col, dim, n_chunks=32):
        from pyspark.sql import Window

        w = Window.orderBy(order_col)
        chunked = df.withColumn(
            "chunk", F.ntile(n_chunks).over(w)
        )
        spans = (
            chunked.groupBy("chunk")
            .agg((F.max(dim) - F.min(dim)).alias("span"))
            .agg(F.avg("span"))
            .first()[0]
        )
        return spans

    z_day_span = mean_chunk_span(keyed, "zkey", "b")
    cust_day_span = mean_chunk_span(keyed, "a", "b")
    z_cust_span = mean_chunk_span(keyed, "zkey", "a")
    # z-order bounds the day dimension far better than custkey-sorting
    assert z_day_span < 0.5 * cust_day_span, (z_day_span, cust_day_span)
    # and still clusters custkey (span far below the full 1500-key range)
    full_cust_span = keyed.agg(F.max("a") - F.min("a")).first()[0]
    assert z_cust_span < 0.5 * full_cust_span, (z_cust_span, full_cust_span)


def test_hll_sketch_rollup_close_to_exact_and_union_consistent(spark, tables):
    from spark_monotasks_spark.queries.extended import hll_sketch_rollup
    from tests.conftest import SF_TEST_DIR

    got = {r.o_orderstatus: r.est_distinct_cust
           for r in hll_sketch_rollup(spark, SF_TEST_DIR).collect()}
    exact = {
        r.o_orderstatus: r.n
        for r in tables["orders"]
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:  # default lgConfigK=12 → rse ~1.6%; allow 5%
        assert abs(got[k] - exact[k]) <= max(3, 0.05 * exact[k]), (k, got[k], exact[k])
    # merging finer sketches must equal sketching the coarse grain directly
    direct = {
        r.o_orderstatus: r.est
        for r in tables["orders"]
        .groupBy("o_orderstatus")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est"))
        .collect()
    }
    assert got == direct


# --- RDD-passthrough facades (operators/rdd_bridge.py) ---------------------

def test_glom_partitions_preserves_rows(spark):
    from spark_monotasks_spark.operators import rdd_bridge

    df = spark.range(100).repartition(4)
    got = rdd_bridge.glom_partitions(df).collect()
    assert sum(r.n_rows for r in got) == 100
    assert all(len(r.rows) == r.n_rows for r in got)
    ids = sorted(x.id for r in got for x in r.rows)
    assert ids == list(range(100))


def test_take_sample_without_replacement_exact_and_deterministic(spark):
    from spark_monotasks_spark.operators import rdd_bridge

    df = spark.range(500)
    a = sorted(r.id for r in rdd_bridge.take_sample(df, 20, seed=7).collect())
    b = sorted(r.id for r in rdd_bridge.take_sample(df, 20, seed=7).collect())
    assert len(a) == 20 and a == b           # exact size, seed-stable
    assert len(set(a)) == 20                 # no duplicates
    c = sorted(r.id for r in rdd_bridge.take_sample(df, 20, seed=8).collect())
    assert a != c                            # seed actually matters


def test_take_sample_with_replacement_allows_duplicates(spark):
    from spark_monotasks_spark.operators import rdd_bridge

    df = spark.range(5)
    got = [r.id for r in
           rdd_bridge.take_sample(df, 40, with_replacement=True, seed=3).collect()]
    assert len(got) == 40                    # exact size > population
    assert set(got) <= set(range(5))
    assert len(set(got)) < 40                # pigeonhole: duplicates exist

    import pytest as _pytest
    with _pytest.raises(ValueError, match="negative"):
        rdd_bridge.take_sample(df, -1)
    assert rdd_bridge.take_sample(df, 0).count() == 0
    assert rdd_bridge.take_sample(df.limit(0), 3,
                                  with_replacement=True).count() == 0


def test_pipe_lines_roundtrip_through_cat(spark):
    from spark_monotasks_spark.operators import rdd_bridge

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "k int, v string"
    )
    got = sorted(r.line for r in rdd_bridge.pipe_lines(df, ["cat"]).collect())
    assert got == ["1\talpha", "2\tbeta"]


# --- distributed zipWithIndex (operators/indexing.py) ----------------------

def test_zip_with_index_ordered_matches_row_number(spark):
    from pyspark.sql import functions as F

    from spark_monotasks_spark.operators.indexing import zip_with_index

    df = spark.range(1000).select((F.col("id") * 7 % 1000).alias("k"))
    got = {r.k: r.idx for r in zip_with_index(df, order_cols=["k"]).collect()}
    assert got == {k: k for k in range(1000)}  # unique keys -> idx == rank


def test_zip_with_index_partition_layout_contiguous(spark):
    from spark_monotasks_spark.operators.indexing import zip_with_index

    df = spark.range(500).repartition(7)
    idxs = sorted(r.idx for r in zip_with_index(df).collect())
    assert idxs == list(range(500))  # contiguous 0-based, no collisions


def test_zip_with_index_no_single_partition_exchange_on_big_side(spark):
    """The r4 regression class: the INPUT must never shuffle to one
    task.  The only SinglePartition exchange allowed is beneath the
    per-partition-counts aggregate (<= num_partitions rows)."""
    from spark_monotasks_spark.operators.indexing import zip_with_index

    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    plan = (
        zip_with_index(df.select("o_orderkey"), order_cols=["o_orderkey"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            # its direct child (next line) must be the per-partition
            # counts aggregate — never a scan/sort of the raw input
            assert "HashAggregate" in lines[i + 1], plan

    empty = zip_with_index(df.limit(0), order_cols=["o_orderkey"])
    assert empty.count() == 0  # empty input stays empty, no crash


def test_profile_columns_exact_and_approx(spark):
    """profile_columns: exact mode returns true counts/verdicts; approx
    mode (HLL++) lands within rsd of the exact distinct count and keeps
    every non-distinct measure identical."""
    from spark_monotasks_spark.operators.profile import profile_columns

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 4 != 0, F.col("id") % 10).alias("mod_nullable"),
    )
    exact = {r.column_name: r for r in profile_columns(
        df, ["id", "mod_nullable"]).collect()}
    assert exact["id"].n_rows == 1000
    assert exact["id"].n_nonnull == 1000
    assert exact["id"].n_distinct == 1000
    assert exact["id"].is_unique and exact["id"].is_complete
    assert exact["id"].min_val == 0.0 and exact["id"].max_val == 999.0
    m = exact["mod_nullable"]
    assert m.n_nonnull == 750 and m.n_distinct == 10
    assert not m.is_complete and not m.is_unique
    assert m.completeness == 0.75

    approx = {r.column_name: r for r in profile_columns(
        df, ["id", "mod_nullable"], exact_distinct=False, rsd=0.05).collect()}
    assert abs(approx["id"].n_distinct - 1000) <= 1000 * 0.05 * 3
    assert approx["mod_nullable"].n_nonnull == 750
    assert approx["mod_nullable"].completeness == 0.75


def test_profile_columns_empty_and_arg_guard(spark):
    from spark_monotasks_spark.operators.profile import profile_columns

    empty = spark.range(0).select(F.col("id"))
    rows = profile_columns(empty, ["id"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_rows == 0 and r.n_nonnull == 0 and r.completeness is None
    with pytest.raises(ValueError):
        profile_columns(empty, [])


def test_iqr_outlier_screen_hand_example(spark):
    from spark_monotasks_spark.operators.profile import iqr_outlier_screen

    rows = [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 100])]
    rows += [("h", i, float(v)) for i, v in enumerate([10, 10, 10, 10])]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    out = {r.grp: r for r in iqr_outlier_screen(df, "v", ["grp"], "id").collect()}
    g = out["g"]
    # ranks: q1 at floor(8*0.25)+1 = 3 -> 3.0; q3 at floor(8*0.75)+1 = 7 -> 7.0
    assert (g.q1, g.q3) == (3.0, 7.0)
    assert (g.lo, g.hi) == (3.0 - 6.0, 7.0 + 6.0)
    assert g.n_rows == 9 and g.n_outliers == 1  # only the 100
    h = out["h"]
    assert h.q1 == h.q3 == 10.0 and h.n_outliers == 0

    with pytest.raises(ValueError):
        iqr_outlier_screen(df, "v", ["grp"], "id", k=-1.0)


def test_ohlc_resample_hand_example(spark):
    from spark_monotasks_spark.operators.timeseries import ohlc_resample

    rows = [
        ("a", "2024-01-01 10:05:00", 5.0),
        ("a", "2024-01-01 10:10:00", 9.0),
        ("a", "2024-01-01 10:50:00", 2.0),
        ("a", "2024-01-01 11:01:00", 7.0),
        # tie on ts: open must pick the SMALLER value (deterministic)
        ("b", "2024-01-01 10:00:00", 4.0),
        ("b", "2024-01-01 10:00:00", 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {(r.k, str(r.bucket)): r for r in ohlc_resample(
        df, "ts", "v", ["k"], "1 hour").collect()}
    a10 = out[("a", "2024-01-01 10:00:00")]
    assert (a10.open, a10.high, a10.low, a10.close, a10.n) == (5.0, 9.0, 2.0, 2.0, 3)
    a11 = out[("a", "2024-01-01 11:00:00")]
    assert (a11.open, a11.close, a11.n) == (7.0, 7.0, 1)
    b10 = out[("b", "2024-01-01 10:00:00")]
    assert (b10.open, b10.close) == (3.0, 4.0)  # tie -> value-ordered


# --- distributed running total ----------------------------------------------

def test_running_total_matches_window_semantics(spark):
    import random as _random

    from spark_monotasks_spark.operators.indexing import running_total

    rng = _random.Random(3)
    rows = [(i, rng.randint(1, 50), rng.random()) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long, q double").repartition(13)
    got = {
        r.id: r.rt
        for r in running_total(
            df, "v", [F.col("q").desc(), F.col("id")], total_col="rt"
        ).collect()
    }
    expect, acc = {}, 0
    for i, v, _ in sorted(rows, key=lambda r: (-r[2], r[0])):
        acc += v
        expect[i] = acc
    assert got == expect


def test_running_total_correct_on_nondeterministic_order_input(spark):
    """Regression (r7): the offsets branch and the row branch are two
    physical jobs; with a hash-AGGREGATE input the in-partition row
    order feeding the range sampler differed between them, the jobs
    sampled different range boundaries, and every prefix sum past the
    first diverging partition silently corrupted (observed: 6333/7300
    wrong cumulative counts).  The positioned layout is now pinned with
    a lazy localCheckpoint so both jobs read ONE materialization."""
    from spark_monotasks_spark.operators.indexing import (
        running_total,
        zip_with_index,
    )

    base = spark.range(20000).select(
        (F.col("id") % 3571).alias("k"), F.lit(1).alias("one")
    )
    g = base.groupBy("k").agg(F.count("*").alias("n"))
    got = sorted(
        (r.k, r.n, r.rt)
        for r in running_total(g, "n", ["k"], total_col="rt").collect()
    )
    acc = 0
    for k, n, rt in got:  # keys come back sorted; prefix must be exact
        acc += n
        assert rt == acc, (k, rt, acc)
    # same hazard in zip_with_index(ordered) — index must be the exact
    # dense rank even when the input is an aggregate
    idx = sorted(
        (r.k, r.idx) for r in zip_with_index(g, ["k"], "idx").collect()
    )
    assert [i for _, i in idx] == list(range(len(idx)))


def test_running_total_plan_has_no_global_window(spark):
    """The whole point: the input-sized relation must never pass
    through an un-partitioned window (one-task Exchange)."""
    from spark_monotasks_spark.operators.indexing import running_total

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = running_total(df, "v", [F.col("id")])
    s = out._jdf.queryExecution().optimizedPlan().toString()
    # optimized logical plan prints windows as
    #   Window [exprs], [partitionSpec], [orderSpec]  (partitioned)
    #   Window [exprs], [orderSpec]                   (un-partitioned)
    import re as _re

    wins = _re.findall(r"Window \[.*", s)
    unpart = [w for w in wins if w.count("], [") == 1]
    # the only legitimate un-partitioned window is the cumulative
    # offsets pass over the per-partition sums AGGREGATE (<= P rows);
    # it is recognizable by _psum — the input-sized prefix sum must be
    # the _pid-partitioned window instead
    assert all("_psum" in w for w in unpart), s
    assert any("_pid" in w and w.count("], [") == 2 for w in wins), s


def test_skew_report_values_and_order(spark):
    from spark_monotasks_spark.operators.profile import skew_report

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [(r.k, r.n, r.share, r.x_over_mean)
           for r in skew_report(df, ["k"], top_n=2).collect()]
    # 10 rows, 3 keys, mean load 10/3
    assert got == [("a", 6, 0.6, 1.8), ("b", 3, 0.3, 0.9)]


def test_compaction_bins_contiguous_fill(spark):
    from spark_monotasks_spark.operators.layout import compaction_bins

    rows = [(f"f{i:02d}", sz) for i, sz in
            enumerate([60, 60, 30, 100, 10, 10, 40])]
    df = spark.createDataFrame(rows, "path string, bytes long")
    out = {r.path: (r.cum_bytes, r.bin)
           for r in compaction_bins(df, target_bytes=100).collect()}
    # cum: 60,120,150,250,260,270,310 ; bin = (cum-size) div 100
    assert out == {
        "f00": (60, 0), "f01": (120, 0), "f02": (150, 1), "f03": (250, 1),
        "f04": (260, 2), "f05": (270, 2), "f06": (310, 2),
    }
    # coverage invariant: every non-final bin closes at cumulative
    # size >= (bin+1)*target
    import collections
    maxcum = collections.defaultdict(int)
    for p, _ in rows:
        cum, b = out[p]
        maxcum[b] = max(maxcum[b], cum)
    last = max(maxcum)
    assert all(v >= (b + 1) * 100 for b, v in maxcum.items() if b != last)


def test_data_skipping_prunes_files_and_matches_full_scan(spark, tmp_path):
    from spark_monotasks_spark.operators.layout import (
        read_skipping,
        write_sorted_with_manifest,
    )

    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    path = str(tmp_path / "skiptab")
    write_sorted_with_manifest(df, path, "id", num_files=16)
    man = spark.read.parquet(path + "__manifest").collect()
    assert len(man) == 16
    # disjoint, ordered ranges — the point of the range-sorted write
    ranges = sorted((r.key_min, r.key_max) for r in man)
    assert all(a2 > b1 for (_, b1), (a2, _) in zip(ranges, ranges[1:]))

    pruned = read_skipping(spark, path, "id", 2_000, 2_999)
    full = spark.read.parquet(path).filter(F.col("id").between(2000, 2999))
    assert sorted((r.id, r.v) for r in pruned.collect()) == sorted(
        (r.id, r.v) for r in full.collect()
    )
    # file-level skipping is real: the pruned scan reads few files
    n_read = len(
        {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    )
    assert n_read <= 3, n_read
    # empty overlap window -> empty result, schema intact
    none = read_skipping(spark, path, "id", 50_000, 60_000)
    assert none.count() == 0 and none.columns == ["id", "v"]


def test_append_with_manifest_extends_stats_incrementally(spark, tmp_path):
    from spark_monotasks_spark.operators.layout import (
        append_with_manifest,
        read_skipping,
        write_sorted_with_manifest,
    )

    base = spark.range(0, 4_000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "growtab")
    write_sorted_with_manifest(base, path, "id", num_files=8)
    man0 = {r.file: (r.key_min, r.key_max)
            for r in spark.read.parquet(path + "__manifest").collect()}

    delta = spark.range(4_000, 5_000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(2)
    append_with_manifest(delta, path, "id")
    man1 = {r.file: (r.key_min, r.key_max)
            for r in spark.read.parquet(path + "__manifest").collect()}
    # old rows untouched, only new files added
    assert all(man1[f] == rng for f, rng in man0.items())
    new = {f: rng for f, rng in man1.items() if f not in man0}
    assert len(new) == 2
    assert min(lo for lo, _ in new.values()) == 4_000

    # pruned reads stay exact across the appended range
    pruned = read_skipping(spark, path, "id", 3_900, 4_200)
    full = spark.read.parquet(path).filter(F.col("id").between(3900, 4200))
    assert sorted(r.id for r in pruned.collect()) == sorted(
        r.id for r in full.collect()
    )
    # and still actually skip: the window touches at most 1 old + 2 new files
    n_read = pruned.select(F.input_file_name()).distinct().count()
    assert n_read <= 3, n_read
