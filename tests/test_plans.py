"""Physical-plan quality gates (SURVEY §4): the optimizations the
reference implemented by hand (predicate pushdown, column pruning,
broadcast-join selection, top-k) must actually appear in our plans —
not just produce correct rows.  These assert on `.explain` output the
way the reference's optimizer suites assert on rewritten plans
(FilterPushdownSuite, etc.).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from spark_monotasks_spark.queries import QUERY_REGISTRY

from tests.conftest import catalog_sample

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    """ParquetFilters.scala parity: the filter must be in PushedFilters,
    not applied post-scan only."""
    df = QUERY_REGISTRY["scan_filter_project"](spark, SF)
    plan = formatted(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "GreaterThan" in m.group(1) or "IsNotNull" in m.group(1), m.group(1)


def test_column_pruning_in_read_schema(spark):
    """Column pruning (Optimizer.scala:120): a 2-column projection reads
    2 columns, not all 11 lineitem columns."""
    df = QUERY_REGISTRY["scan_filter_project"](spark, SF)
    plan = formatted(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(read_cols) <= 3, read_cols  # projected + filtered cols only


def test_broadcast_join_for_dims(spark):
    """Broadcast selection (SparkStrategies.scala:68): bounded dims join
    as BroadcastHashJoin, never shuffled-merge."""
    df = QUERY_REGISTRY["tpch_q5_region_revenue"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # region/nation (25 + 5 rows) must not trigger a full shuffle join
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_topk_plans_take_ordered(spark):
    """TakeOrdered (basicOperators.scala:121) parity: orderBy+limit must
    plan as TakeOrderedAndProject (bounded priority queue), not a global
    sort."""
    df = QUERY_REGISTRY["topk_orders"](spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator


def test_partial_aggregation_before_shuffle(spark):
    """Partial+final agg split (Aggregate.scala:49-58): map-side combine
    must appear (two HashAggregate levels)."""
    df = QUERY_REGISTRY["tpch_q1_pricing"](spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial" in plan.lower()


def test_whole_stage_codegen_covers_agg(spark):
    """Expression codegen parity (SURVEY §4.3): the hot path (scan →
    filter → partial agg) must be inside WholeStageCodegen."""
    df = QUERY_REGISTRY["tpch_q1_pricing"](spark, SF)
    df.collect()  # AQE finalizes the physical plan only on execution
    plan = plan_of(df)
    # '*(n)' prefixes are WholeStageCodegen stage markers in the
    # executed-plan string; both scan side (1) and final agg (2) must be
    # covered
    assert re.search(r"\*\(1\) HashAggregate", plan), plan
    assert re.search(r"\*\(2\) HashAggregate", plan), plan


def test_semi_join_stays_semi(spark):
    """LeftSemiJoinHash parity: semi join must not degrade to inner +
    distinct."""
    df = QUERY_REGISTRY["join_left_semi"](spark, SF)
    plan = plan_of(df)
    assert "LeftSemi" in plan


def test_lsh_topk_avoids_full_cartesian(spark):
    """The LSH path exists to avoid the brute-force scan: its plan joins
    on bucket equality (hash join), never a nested-loop cartesian."""
    df = QUERY_REGISTRY["ann_lsh_topk"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Hive-style k=v partition discovery + pruning (newParquet.scala:863):
    a filter on the partition column must prune partitions at scan."""
    from spark_monotasks_spark.sources import io as sio

    src = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    sio.write_parquet(src, path, mode="overwrite", partition_by=["status"])
    df = spark.read.parquet(path).filter(F.col("status") == "F").select("o_orderkey")
    plan = formatted(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "status" in m.group(1), plan


def test_sessionize_single_shuffle(spark):
    """events_sessionize's claim: one user_id exchange + one sort serve
    both window passes AND the final aggregate (same partition key —
    no re-shuffle between stages)."""
    df = QUERY_REGISTRY["events_sessionize"](spark, SF)
    df.collect()
    final = plan_of(df).split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert len(re.findall(r"\bSort \[", final)) == 1, final


def test_parquet_aggregate_pushdown_v2(spark):
    """min/max/count over plain parquet can come from footer statistics
    (PushedAggregation) with the v2 reader — at 100 TB that's a
    metadata-only query.  Scoped to this test: v2 path-reads lack v1
    features (bucketed tables), so the session default stays v1."""
    prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(f"{SF}/lineitem.parquet").agg(
            F.min("l_quantity"), F.max("l_quantity"), F.count("*")
        )
        plan = formatted(df)
        m = re.search(r"PushedAggregation: \[([^\]]*)\]", plan)
        assert m and "MIN" in m.group(1).upper(), plan
        # correctness unchanged under pushdown
        r = df.first()
        assert r[2] > 0 and r[0] <= r[1]
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev)


def test_q18_aggregates_before_join(spark):
    """tpch_q18: the HAVING aggregate must run BELOW the joins (shrink
    the fact first) — an agg-above-join plan would shuffle the full
    3-way join output."""
    df = QUERY_REGISTRY["tpch_q18_big_orders"](spark, SF)
    plan = plan_of(df)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # executed-plan string prints top-down: joins appear before (above)
    # the aggregate that feeds them
    assert join_pos < agg_pos, plan


def test_q4_exists_plans_semi_join(spark):
    """tpch_q4: EXISTS must stay a left-semi join, not inner+distinct."""
    plan = plan_of(QUERY_REGISTRY["tpch_q4_priority"](spark, SF))
    assert "LeftSemi" in plan, plan


def test_q21_exists_pair_plans_semi_and_anti(spark):
    """tpch_q21: EXISTS → LeftSemi and NOT EXISTS → LeftAnti must both
    survive planning (not degrade to inner+distinct / outer+filter)."""
    plan = plan_of(QUERY_REGISTRY["tpch_q21_waiting"](spark, SF))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_q17_decorrelated_avg_is_partial_agg(spark):
    """tpch_q17: the per-part AVG must be a partial+final hash aggregate
    feeding a join — i.e. the decorrelated plan, with map-side combine,
    not a per-row recomputation."""
    plan = plan_of(QUERY_REGISTRY["tpch_q17_small_qty"](spark, SF))
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial" in plan.lower(), plan


def test_q11_threshold_is_broadcast_not_second_shuffle(spark):
    """tpch_q11: the global-threshold compare must come in as a broadcast
    (1-row) join against the grouped side — never a nested-loop over the
    full grouped output or a cartesian."""
    df = QUERY_REGISTRY["tpch_q11_important_parts"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert "Broadcast" in plan, plan


def test_q2_correlated_max_no_cartesian(spark):
    """tpch_q2: the decorrelated max-per-part join must stay a hash/merge
    equi-join; region+nation stay broadcast."""
    plan = plan_of(QUERY_REGISTRY["tpch_q2_top_supplier_part"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_quality_rules_single_projection_no_shuffle(spark):
    """gopher_quality_rules must be one narrow codegen'd projection: no
    Exchange, no Python evaluation in the plan."""
    df = QUERY_REGISTRY["quality_filter_rules"](spark, SF)
    plan = plan_of(df)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan  # no UDF fell into the hot path
    # single Project over the scan (higher-order lambdas are JVM-side
    # but codegen-fallback, so no WholeStageCodegen assert)
    assert plan.count("Project") == 1, plan


def test_media_probe_no_shuffle(spark):
    """media_meta_extract: encode + header parse are mapInPandas stages
    over the scan — blobs must never shuffle."""
    df = QUERY_REGISTRY["media_meta_extract"](spark, SF)
    plan = plan_of(df)
    assert "Exchange" not in plan, plan


def test_pack_manifest_single_shuffle(spark):
    """pack_manifest: the shard window and the (shard, seq_id) groupBy
    must share ONE hash-partitioning on shard — the explode and final
    agg may not introduce a second whole-corpus shuffle.  (hashpartitioning
    appears once for the window and once for the partial/final agg pair
    over the SAME keys prefix; assert ≤ 2 Exchanges total.)"""
    df = QUERY_REGISTRY["pack_manifest"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_ngram_jaccard_block_no_cartesian(spark):
    """The minhash-bucketed jaccard demo must join on the bucket key —
    never CartesianProduct / BroadcastNestedLoop."""
    df = QUERY_REGISTRY["ngram_jaccard_block"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bucketed_smb_join_zero_shuffle(spark):
    """Bucketed sort-merge join: both sides bucketed (8) on their join
    key → the join itself plans ZERO Exchange (the whole point of the
    bucketed layout at 100 TB).  Rebuilt inline because the catalog
    entry localCheckpoints its result (the tables are dropped in its
    finally block), which hides the join plan."""
    import uuid

    from spark_monotasks_spark.sources import io as sio
    from spark_monotasks_spark.tables import load_tables

    t = load_tables(spark, SF)
    tag = uuid.uuid4().hex[:12]
    t_o, t_c = f"plan_bkt_o_{tag}", f"plan_bkt_c_{tag}"
    try:
        sio.save_as_table(
            t["orders"].select("o_custkey", "o_totalprice"),
            t_o, mode="overwrite", bucket_by=(8, ["o_custkey"]),
        )
        sio.save_as_table(
            t["customer"].select("c_custkey", "c_mktsegment"),
            t_c, mode="overwrite", bucket_by=(8, ["c_custkey"]),
        )
        o, c = spark.table(t_o), spark.table(t_c)
        joined = o.hint("merge").join(
            c, o["o_custkey"] == c["c_custkey"], "inner"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # the same join WITHOUT bucketed inputs must shuffle — proves
        # the zero-Exchange plan above is the bucketing, not a fluke
        o2 = t["orders"].select("o_custkey", "o_totalprice")
        c2 = t["customer"].select("c_custkey", "c_mktsegment")
        unbucketed = o2.hint("merge").join(
            c2, o2["o_custkey"] == c2["c_custkey"], "inner"
        )
        assert "Exchange" in plan_of(unbucketed)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_aqe_skew_join_splits_hot_partition(spark):
    """r7 verdict ask #6: under REAL Zipf skew (hot key = ~50% of fact
    rows) and the entry's lowered thresholds, AQE's OptimizeSkewedJoin
    must actually split the hot partition — the final adaptive plan
    marks the sort-merge join ``skew=true``.  Rebuilt inline because
    the catalog entry localCheckpoints its result (conf scoping),
    which hides the join plan.  At production scale the default 256 MB
    threshold triggers the same split with no tuning.  (_zipf_sides
    repartitions the fact to 16 mappers — AQE splits skewed reducer
    partitions at mapper granularity, and a one-file local scan's
    single mapper makes the hot partition unsplittable.)"""
    from spark_monotasks_spark.queries.scale_extras import (
        _zipf_agg,
        _zipf_sides,
    )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256k",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        fact, dim = _zipf_sides(spark, SF)
        out = _zipf_agg(fact.join(dim, on="key"))
        out.collect()  # executes THIS DataFrame's QueryExecution,
        # finalizing its adaptive plan (a .write would spawn a separate
        # QueryExecution and leave this one unexecuted)
        final = plan_of(out)
        assert re.search(r"SortMergeJoin.*skew=true", final), final
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_skew_salted_join_plan(spark):
    """skew_salted_join: dim side explodes x16, fact side never
    broadcast — the join shuffles BOTH sides on (key, salt) so a hot
    key spreads over 16 partitions.  Assert the explode (Generate) is
    present and the join is a hash/sort-merge on the salted key, not a
    broadcast of the pre-explode dim (which would defeat the routing)."""
    df = QUERY_REGISTRY["skew_salted_join"](spark, SF)
    plan = plan_of(df)
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_snapshot_diff_single_join_shuffle(spark):
    """snapshot_diff: one full-outer join on the snapshot key — the
    churn-proportional diff must not add extra whole-table shuffles
    beyond the join's two input exchanges."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from spark_monotasks_spark.sources import versioned as V
    from spark_monotasks_spark.tables import load_tables

    t = load_tables(spark, SF)
    o = t["orders"].select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="plan_snapdiff_")
    try:
        V.write_version(o.filter(F.col("o_orderkey") <= 100), path)
        V.write_version(o.filter(F.col("o_orderkey") <= 200), path,
                        mode="overwrite")
        v1 = V.read_version(spark, path, 1).alias("v1")
        v2 = V.read_version(spark, path, 2).alias("v2")
        diff = v1.join(
            v2, F.col("v1.o_orderkey") == F.col("v2.o_orderkey"),
            "full_outer",
        )
        plan = plan_of(diff)
        assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 2, plan
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_quantile_normalize_interval_join_is_equi(spark):
    """quantile_normalize_scores is cartesian-allowlisted for its 1-row
    N broadcast, so gate the rest here explicitly: the interval lookup
    must be the bucketed equi-join (hash/sort-merge on (_k, _bkt)),
    leaving AT MOST the single scalar-broadcast BNLJ in the plan."""
    df = QUERY_REGISTRY["quantile_normalize_scores"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "_bkt" in plan, plan  # the bucketed range join key


def test_spatial_grid_knn_no_cartesian(spark):
    """The grid candidate join must be an equi-join on the cell key —
    never the brute-force cross product the oracle uses."""
    df = QUERY_REGISTRY["spatial_grid_knn"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "_cx" in plan and "_cy" in plan, plan  # joins on the cell key


def test_salted_agg_two_stage_plan(spark):
    """salted_agg must show the two-stage shape: one Exchange on
    (keys, salt), one on keys — and Tungsten partial aggregation on
    both levels (4 HashAggregate nodes total)."""
    df = QUERY_REGISTRY["salted_agg_skew"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("HashAggregate") == 4, plan


def test_segment_dedup_text_never_shuffles(spark):
    """drop_duplicate_segments' scale claim, plan-gated: no shuffle
    exchange may carry the document text (or exploded segment strings) —
    only (fp, id, pos) keys and the per-doc drop sets move; the doc
    table re-enters via broadcast."""
    def output_names(node_line: str) -> set[str]:
        """Top-level output attribute names of a plan node line: split
        the first [...] at top-level commas, take each item's final
        `name#id` token (the alias for computed columns)."""
        start = node_line.index("[") + 1
        depth, item, items = 0, "", []
        for ch in node_line[start:]:
            if ch == "[" or ch == "(":
                depth += 1
            elif ch == ")" or (ch == "]" and depth > 0):
                depth -= 1
            elif ch == "]" and depth == 0:
                break
            if ch == "," and depth == 0:
                items.append(item)
                item = ""
            else:
                item += ch
        items.append(item)
        names = set()
        for it in items:
            m = re.findall(r"(\w+)#\d+", it)
            if m:
                names.add(m[-1])
        return names

    df = QUERY_REGISTRY["segment_dedup_reassemble"](spark, SF)
    lines = plan_of(df).split("\n")
    shuffle_children = [
        lines[i + 1]
        for i, l in enumerate(lines)
        if "Exchange hashpartitioning" in l and i + 1 < len(lines)
    ]
    assert shuffle_children, "expected shuffles in the dedup plan"
    for child in shuffle_children:  # exchange output == its child's output
        names = output_names(child)
        assert "text" not in names and "seg" not in names, child


def test_merge_upsert_catalog_plan_broadcast_anti(spark):
    """merge_upsert_orders: the base table must never shuffle — the
    change-batch keys broadcast into a LeftAnti hash join."""
    df = QUERY_REGISTRY["merge_upsert_orders"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_scd2_catalog_plan_dim_never_shuffles(spark):
    """scd2_customer_dim: every dimension-side join (change detection,
    new-key anti, untouched-current anti) must be broadcast — the only
    hash Exchange allowed is the row_number window over the SMALL
    update batch (latest-ts-per-key collapse)."""
    df = QUERY_REGISTRY["scd2_customer_dim"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the update-batch window collapse is the sole permitted key-shuffle
    # (it appears once per reuse in the union branches)
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Exchange hashpartitioning" not in l:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "valid_from" not in child and "is_current" not in child, (
            l + "\n" + child
        )


def test_incremental_refresh_single_merge_shuffle(spark):
    """incremental_agg_refresh: delta aggregation + state merge must
    plan as partial/final HashAggregates with shuffles only on the
    grouping keys (never a full re-partition of raw history rows
    beyond the initial state build)."""
    df = QUERY_REGISTRY["incremental_agg_refresh"](spark, SF)
    plan = plan_of(df)
    assert "HashAggregate" in plan
    # state build + delta agg + merge ⇒ at most 3 key-shuffles
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_null_safe_join_plans_hash_not_nested_loop(spark):
    """EqualNullSafe is equi-joinable: Catalyst must plan a hash join
    (broadcast or shuffled), never BroadcastNestedLoopJoin."""
    df = QUERY_REGISTRY["join_null_safe"](spark, SF)
    plan = plan_of(df)
    assert "HashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dynamic_partition_pruning_on_join(spark, tmp_path):
    """Dynamic partition pruning: joining a status-partitioned fact to a
    FILTERED tiny dim must inject a runtime pruning subquery into the
    fact scan (dynamicpruning expression) — at 100 TB this skips whole
    partitions based on the dim filter, without a static predicate."""
    from spark_monotasks_spark.sources import io as sio

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        src = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
            "status", F.col("o_orderstatus")
        )
        path = str(tmp_path / "orders_dpp")
        sio.write_parquet(src, path, mode="overwrite", partition_by=["status"])
        fact = spark.read.parquet(path)
        dim = spark.createDataFrame(
            [("F", "finished")], "status string, label string"
        )
        joined = fact.join(dim, on="status").filter(
            F.col("label") == "finished"
        ).select("o_orderkey", "label")
        plan = formatted(joined)
        assert "dynamicpruning" in plan.lower(), plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )


def test_exchange_reuse_in_self_union(spark):
    """Exchange reuse: two aggregations over the same shuffled child in
    one query must plan ONE shuffle + a ReusedExchange, not two
    identical exchanges — Spark's cross-subtree dedup of work."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    two = agg.filter(F.col("q") > 0).union(agg.filter(F.col("q") < 0))
    two.collect()  # AQE finalizes reuse only on execution
    plan = plan_of(two)
    assert "ReusedExchange" in plan or plan.count("Exchange hashpartitioning") == 1, plan


def test_session_window_single_shuffle(spark):
    """Native session windows: one user_id exchange serves gap
    detection, session assignment, and the final aggregate."""
    df = QUERY_REGISTRY["session_window_sql"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter join pruning (InjectRuntimeFilter): for a
    fact-fact shuffle join where one side carries a selective filter,
    the optimizer builds a bloom filter over the selective side's join
    keys (bloom_filter_agg) and prunes the big side's rows BEFORE the
    shuffle (might_contain) — at 100 TB this cuts the probe-side
    exchange by the filter's selectivity.  Locally the application side
    is under the 10 GiB applicationSideScanSizeThreshold that gates the
    rewrite (it exists so small scans skip the extra aggregate), so the
    test lowers it to simulate the at-scale decision; broadcast is
    disabled because a broadcast join already hash-prunes and needs no
    bloom filter."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    old_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from spark_monotasks_spark.tables import load_tables

        t = load_tables(spark, SF)
        sel = t["orders"].filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 200000)
        )
        j = t["lineitem"].join(
            sel, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderpriority").agg(F.sum("l_extendedprice").alias("rev"))
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt
        assert "might_contain" in opt, opt
        # the rewrite must not change results: revenue equals the plain
        # join's revenue with the filter applied post-hoc
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thr,
        )
        plain = t["lineitem"].join(
            sel, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderpriority").agg(F.sum("l_extendedprice").alias("rev"))
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        assert j.collect() == plain.collect()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thr,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_cbo_rowcount_from_analyzed_stats(spark, tmp_path):
    """Cost-based planning consumes ANALYZE stats: with CBO on, the
    optimized plan of an analyzed table carries the exact rowCount the
    scan command computed — the number every join-reorder/broadcast
    decision keys off.  Without ANALYZE the estimate is size-derived
    only (no rowCount)."""
    df = spark.range(0, 1234).selectExpr("id", "id % 7 AS g")
    name = "cbo_stats_probe"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    df.write.saveAsTable(name)
    old = spark.conf.get("spark.sql.cbo.enabled")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        stats = spark.table(name)._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), stats.toString()
        assert int(str(stats.rowCount().get())) == 1234, stats.toString()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_no_hidden_cartesians_across_catalog(spark):
    """Catalog-wide anti-pattern gate: no query may plan a
    CartesianProduct or BroadcastNestedLoopJoin EXCEPT the allowlisted
    entries whose non-equi join is justified — a scalar (1-row
    aggregate or literal query-vector) broadcast side, the explicitly
    cartesian/theta entries, or ALS's blocked factor cross.  Any new
    entry that accidentally drops its equi-condition (a cartesian in
    disguise — O(n^2) at 100 TB) trips this gate at planning time."""
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    allow = {
        # explicit semantics: cross/theta joins ARE the operator
        "join_cross", "join_theta",
        # 1-row broadcast side (scalar aggregate / single query vector):
        # BNLJ with a single-row build is a broadcast scalar, not O(n^2)
        "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_kmeans_topk",
        # filtered ANN shares ann_ivf_topk's 1-row query-vector
        # broadcast; the label predicate only shrinks the probe side
        "ann_filtered_topk",
        "unigram_logprob_score", "tfidf_exact_scores", "bm25_rank_query",
        # perplexity bucketing composes the unigram scorer, inheriting
        # its 1-row corpus-total broadcast cross
        "perplexity_buckets",
        # 1-row broadcast vocab total, same shape as the unigram scorer
        "bigram_logprob_score",
        "inverted_index_build",
        "e2e_training_pipeline", "analyze_table_stats",
        "tpch_q11_important_parts", "tpch_q22_idle_customers",
        "funnel_conversion",
        # chi-square: crossJoin(broadcast(1-row N aggregate)) — the
        # contingency cells are bounded by the category product, and
        # the broadcast side is a single scalar row
        "stat_chisq_independence",
        # BPE merge learning: each round crossJoins the 1-row argmax
        # pair (broadcast scalar) into the re-segmentation fold — one
        # BNLJ per learned merge, never O(n^2)
        "bpe_merge_learning",
        # blocked user x item factor cross IS the recommend-all algorithm
        # (factor tables are rank-bounded, not corpus-sized)
        "ml_als_recommend",
        # skew report: crossJoin(broadcast(1-row totals aggregate)) onto
        # the per-key count relation — a broadcast scalar, never O(n^2)
        "shuffle_skew_report",
        # KMV sketch: each metric row crossJoins two 1-row aggregates
        # (the k-row sketch's estimate scalar x the exact-count scalar)
        "kmv_distinct_setops",
        # KS test: totals = crossJoin(broadcast(1-row max-cumulative
        # aggregate)) onto the distinct-value relation — a broadcast
        # scalar, never O(n^2)
        "stat_ks_two_sample",
        # exact quantiles: crossJoin of the 1-row total AND the 4-row
        # quantile literal onto the cumulative relation — bounded
        # broadcasts, never O(n^2); the mass-weighted twin shares the
        # shape
        "exact_quantiles_prefix",
        "weighted_quantiles_mass",
        # quantile normalization: crossJoin(broadcast(1-row N)) onto the
        # per-(source, value) relation; the interval lookup itself is
        # the bucketed range_join (equi-join), not a nested loop
        "quantile_normalize_scores",
        # bootstrap CI: the overall-mean 1-row aggregate crossJoins the
        # 1-row CI aggregate — two scalars
        "bootstrap_mean_ci",
        # r8: CUSUM crossJoins the 1-row (total, days) aggregate onto
        # the daily relation; the rolling distinct broadcasts the 1-row
        # max-day bound; Benford broadcasts the 1-row digit total —
        # all scalar broadcast sides, never O(n^2)
        "cusum_changepoint",
        "sliding_distinct_users",
        "benford_digit_audit",
        # k-center: each greedy round crossJoins the 1-row newest
        # center (broadcast scalar) — k bounded rounds, never O(n^2)
        "kcenter_coreset",
        # DSIR: crossJoin(broadcast(1-row (nr, nt) totals aggregate))
        # onto the bucket-bounded (<=4096-row) lambda relation — a
        # broadcast scalar onto a bounded table, never O(n^2)
        "dsir_importance_select",
        # keyword scoring crossJoins the 1-row corpus-count aggregate
        "doc_keywords_topk",
        # 3x scalar count subqueries unioned (1-row aggregates)
        "funnel_time_bound",
        # lift scoring crossJoins the 1-row corpus-count aggregate
        "token_lift_pairs",
        # r9: the mixture budget crossJoins the 1-row (total, k)
        # aggregate onto the per-source relation — a broadcast scalar,
        # never O(n^2)
        "mixture_epoch_caps",
        # batched ANN crossJoins the 3-row LITERAL query batch — a
        # bounded broadcast (the whole point: one scan amortized over
        # the batch), never O(n^2)
        "ann_batch_queries",
        # margin mining crossJoins the 4-row LITERAL query batch — the
        # same bounded broadcast as ann_batch_queries, never O(n^2)
        "bitext_margin_mine",
        # banding P/R eval crossJoins three 1-row count aggregates
        "lsh_banding_pr_eval",
        # threshold sweep crossJoins the 1-row truth-count aggregate
        "lsh_threshold_sweep",
    }
    offenders = {}
    for name in catalog_sample(QUERY_REGISTRY):
        fn = QUERY_REGISTRY[name]
        if name in allow:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        tags = [
            t
            for t in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if t in plan
        ]
        if tags:
            offenders[name] = tags
    assert not offenders, offenders


def test_no_row_python_udfs_across_catalog(spark):
    """Catalog-wide slow-path gate: NO query may plan a row-at-a-time
    Python UDF (BatchEvalPython — pickled per-row round trips), and
    Arrow-batched Python stages (MapInPandas / MapInArrow /
    ArrowEvalPython / FlatMapGroupsInPandas) may appear ONLY in the
    allowlisted entries where Python is the point: binary codec decode
    (media/image/audio/jpeg), the script-transform operator, and the
    Arrow vector-preprocessing demo.  Everything else must stay inside
    JVM codegen."""
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    arrow_allow = {
        "media_meta_extract", "image_pixel_stats", "audio_sample_stats",
        "jpeg_decode_stats",      # binary codecs — numpy-vectorized
        "video_probe_meta",       # RIFF container walk (binary codec)
        "video_frame_stats",      # MJPEG frame decode (binary codec)
        "bdb_q4_transform",       # SELECT TRANSFORM external script
        "embedding_normalize_arrow",  # mapInArrow zero-copy demo
        "udaf_weighted_mean",     # pandas grouped-agg UDAF parity demo
        "cogroup_collect",        # pandas cogroup path where exercised
        "image_ahash_neardup",    # PNG encode + decode + aHash (codec)
        "audio_band_fingerprint", # WAV encode + PCM decode (codec)
        "video_content_neardup",  # AVI encode + frame decode (codec)
        "audio_content_neardup",  # WAV encode + PCM decode (codec)
        "compression_ratio_quality",  # DEFLATE encode (codec — the
                                      # gzip quality signal)
    }
    arrow_markers = (
        "ArrowEvalPython", "MapInPandas", "PythonMapInArrow", "MapInArrow",
        "FlatMapGroupsInPandas", "AggregateInPandas", "FlatMapCoGroupsInPandas",
    )
    offenders = {}
    for name in catalog_sample(QUERY_REGISTRY):
        fn = QUERY_REGISTRY[name]
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython (row-at-a-time!)"
            continue
        if name in arrow_allow:
            continue
        tags = [t for t in arrow_markers if t in plan]
        if tags:
            offenders[name] = ",".join(tags)
    assert not offenders, offenders


def _logical_nodes(plan):
    """Depth-first walk of a JVM logical plan via py4j."""
    stack = [plan]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def _is_collapsed(plan) -> bool:
    """True iff every leaf-to-root path in this subtree passes through a
    cardinality-collapsing node (Aggregate / Limit / Distinct) or ends
    at an inherently bounded relation — i.e. the subtree can never be
    corpus-sized no matter how big the input tables get."""
    cls = plan.getClass().getSimpleName()
    if cls in (
        "Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate",
        "LocalRelation", "OneRowRelation",
    ):
        return True
    children = plan.children()
    n = children.size()
    if n == 0:
        return False  # a raw leaf relation (file scan etc.) — unbounded
    return all(_is_collapsed(children.apply(i)) for i in range(n))


def test_no_unpartitioned_windows_over_unbounded_inputs(spark):
    """Catalog-wide scale gate (r5 — generalizes the r4 zip_with_index /
    take_sample findings into a class that cannot recur): a Window with
    an EMPTY partitionSpec plans as Exchange SinglePartition — the whole
    input shuffles to ONE task.  That is only acceptable when the
    window's input is already collapsed (an aggregate / limit / bounded
    relation), e.g. the cumulative-offset pass over per-partition
    counts in operators/indexing.py (<= num_partitions rows) or a
    histogram's bin table.  Any un-partitioned window whose input
    subtree reaches a raw scan without passing through a collapsing
    node is a 100 TB scale-killer and fails here at planning time."""
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    allow = set()  # no exceptions today; add ONLY with a boundedness proof
    offenders = {}
    for name in catalog_sample(QUERY_REGISTRY):
        fn = QUERY_REGISTRY[name]
        if name in allow:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().optimizedPlan()
        bad = [
            node.getClass().getSimpleName()
            for node in _logical_nodes(plan)
            if node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().size() == 0
            and not _is_collapsed(node.child())
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"un-partitioned Window over unbounded input (single-task "
        f"shuffle at scale): {offenders}"
    )


def test_ann_batch_queries_window_group_limit(spark):
    """The batched-ANN rank filter must plan WindowGroupLimit (map-side
    per-partition top-k heaps per qid) — without it, a 3-value
    partition key over a corpus-sized input would funnel n/3 rows per
    task through the window sort."""
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    plan = (
        QUERY_REGISTRY["ann_batch_queries"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
