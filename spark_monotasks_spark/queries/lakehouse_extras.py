"""Lakehouse catalog additions: multi-table ATOMIC snapshots (the
cross-table transaction single-table manifests cannot express) and
Z-order 2-D data skipping (OPTIMIZE ZORDER BY) — both as executed
write→read roundtrips whose results are value-checked against the
unstaged source tables, so the layout/transaction machinery is proven
to lose nothing.

Staging follows the data_skipping_scan discipline: per-run mkdtemp,
removed in a finally block, with the small result localCheckpoint-
pinned so it outlives the deleted files.

Reference anchors (spark-monotasks): the reference's sinks are
in-place SaveMode writes (sources/interfaces.scala) with no snapshot
isolation and no layout stats — beyond-reference additions, marked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


@register(
    "atomic_multi_table_snapshot",
    oracle="""
    SELECT 1 AS txn, 'ord_by_status' AS tbl,
      CAST((SELECT count(DISTINCT o_orderstatus) FROM orders
            WHERE o_orderkey % 2 = 0) AS BIGINT) AS n_rows,
      CAST((SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)
           AS BIGINT) AS total
    UNION ALL
    SELECT 1, 'lines_by_flag',
      CAST((SELECT count(DISTINCT l_returnflag) FROM lineitem
            WHERE l_orderkey % 2 = 0) AS BIGINT),
      CAST((SELECT count(*) FROM lineitem WHERE l_orderkey % 2 = 0)
           AS BIGINT)
    UNION ALL
    SELECT 2, 'ord_by_status',
      CAST((SELECT count(DISTINCT o_orderstatus) FROM orders
            WHERE o_orderkey % 2 = 0)
         + (SELECT count(DISTINCT o_orderstatus) FROM orders
            WHERE o_orderkey % 2 = 1) AS BIGINT),
      CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 2, 'lines_by_flag',
      CAST((SELECT count(DISTINCT l_returnflag) FROM lineitem
            WHERE l_orderkey % 2 = 0)
         + (SELECT count(DISTINCT l_returnflag) FROM lineitem
            WHERE l_orderkey % 2 = 1) AS BIGINT),
      CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    """,
)
def atomic_multi_table_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table ATOMIC snapshot commit through a real two-transaction
    roundtrip (sources.versioned.snapshot_commit / snapshot_read):
    txn 1 commits an orders rollup AND a lineitem rollup (even-keyed
    halves) as ONE transaction; txn 2 appends both odd halves, again
    atomically.  Reading any table AS OF a transaction is then
    guaranteed consistent with every other table at that transaction —
    the invariant the entry surfaces: per (txn, table), the physical
    row count and the summed measure match the source-table cut for
    that txn exactly (the oracle computes both from the raw tables),
    which can only hold if no reader ever observes one table's append
    without the other's.  One txn-manifest hard-link is the commit
    point; a crashed writer leaves orphan directories readers never
    resolve.  Staging is per-run (mkdtemp), removed in finally, result
    localCheckpoint-pinned."""
    import shutil
    import tempfile

    from spark_monotasks_spark.sources import versioned as V

    t = _t(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="spark_graft_txn_")
    try:
        orders, li = t["orders"], t["lineitem"]

        def ord_half(parity: int) -> DataFrame:
            return (
                orders.filter(F.col("o_orderkey") % 2 == parity)
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )

        def li_half(parity: int) -> DataFrame:
            return (
                li.filter(F.col("l_orderkey") % 2 == parity)
                .groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias("n"))
            )

        V.snapshot_commit(
            {"ord_by_status": ord_half(0), "lines_by_flag": li_half(0)}, base
        )
        V.snapshot_commit(
            {"ord_by_status": ord_half(1), "lines_by_flag": li_half(1)}, base
        )
        frames = []
        for txn in (1, 2):
            for tbl in ("ord_by_status", "lines_by_flag"):
                df = V.snapshot_read(spark, base, tbl, txn)
                frames.append(
                    df.agg(
                        F.lit(txn).cast("int").alias("txn"),
                        F.lit(tbl).alias("tbl"),
                        F.count(F.lit(1)).alias("n_rows"),
                        F.sum("n").alias("total"),
                    )
                )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "zorder_box_scan",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(min(l_partkey % 1024) AS BIGINT) AS x_lo,
           CAST(max(l_partkey % 1024) AS BIGINT) AS x_hi,
           CAST(min(l_suppkey % 1024) AS BIGINT) AS y_lo,
           CAST(max(l_suppkey % 1024) AS BIGINT) AS y_hi
    FROM lineitem
    WHERE (l_partkey % 1024) BETWEEN 100 AND 200
      AND (l_suppkey % 1024) BETWEEN 300 AND 400
    """,
)
def zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order 2-D data skipping through a real write→read roundtrip
    (operators.layout.write_zordered_with_manifest / read_box_skipping
    — the Delta/Iceberg OPTIMIZE ZORDER BY idea): lineitem is staged
    range-sorted on the bit-interleaved (x, y) key with per-file zone
    maps on BOTH original dimensions, then a 2-D box query reads only
    files overlapping the box on both axes.  A 1-D sort clusters one
    axis and scatters the other; the Z-curve keeps both locally
    coherent, so the box prunes on both (the layout-effectiveness
    comparison is asserted in tests/test_lakehouse_extras.py).  The
    oracle computes the same box aggregate from the unstaged source,
    so a value match proves pruning loses nothing.  Per-run staging,
    removed in finally, result localCheckpoint-pinned."""
    import shutil
    import tempfile

    from spark_monotasks_spark.operators.layout import (
        read_box_skipping,
        write_zordered_with_manifest,
    )

    t = _t(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="spark_graft_zbox_") + "/li"
    try:
        staged = t["lineitem"].select(
            "l_orderkey",
            "l_quantity",
            (F.col("l_partkey") % 1024).alias("x"),
            (F.col("l_suppkey") % 1024).alias("y"),
        )
        write_zordered_with_manifest(
            staged, base, "x", "y", bits=10, num_files=16
        )
        pruned = read_box_skipping(spark, base, "x", "y", 100, 200, 300, 400)
        out = pruned.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
        ).localCheckpoint()
        return out
    finally:
        shutil.rmtree(base.rsplit("/", 1)[0], ignore_errors=True)


@register(
    "stream_snapshot_commit",
    oracle="""
    SELECT 'events_hourly' AS tbl,
           CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS total
    FROM events
    UNION ALL
    SELECT 'events_by_type',
           CAST(count(DISTINCT event_type) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM events
    """,
)
def stream_snapshot_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest with per-micro-batch ATOMIC
    multi-table commits (streaming.dstream.streaming_snapshot_sink):
    the events stream commits a raw-hourly rollup AND a by-type rollup
    as ONE transaction per batch (sources.versioned.snapshot_commit
    stamped with the batch id), so no reader can ever observe one
    rollup's batch without the other — the consistency guarantee the
    per-table-manifest router only repairs after the fact.  Run
    end-to-end through Structured Streaming (availableNow file source,
    real foreachBatch commits), then both tables read back from the
    latest snapshot; totals must equal the batch aggregates over the
    raw events (the oracle), and the cross-table invariant — identical
    event totals — is part of the hashed result.  Replay idempotence
    (multi-batch, partial-crash) is covered in
    tests/test_lakehouse_extras.py."""
    import os
    import shutil
    import tempfile

    from spark_monotasks_spark.sources import versioned as V
    from spark_monotasks_spark.streaming import dstream
    from spark_monotasks_spark import tables

    tables.ensure_parity_confs(spark)
    stage = tempfile.mkdtemp(prefix="stream_txn_")
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(indir, "events.parquet"),
    )
    base = os.path.join(stage, "tables")
    try:
        stream = dstream.file_stream(
            spark, indir, spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        stream = tables._fix_nanos(stream)

        def build(batch: DataFrame) -> dict[str, DataFrame]:
            return {
                "events_hourly": batch.groupBy(
                    F.date_trunc("hour", "ts").alias("hour")
                ).agg(F.count(F.lit(1)).alias("n")),
                "events_by_type": batch.groupBy("event_type").agg(
                    F.count(F.lit(1)).alias("n")
                ),
            }

        q = (
            dstream.streaming_snapshot_sink(
                stream, base, os.path.join(stage, "ck"), build
            )
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("snapshot sink did not drain within 300s")
        if not V.list_snapshots(base):  # zero micro-batches (no input)
            return spark.createDataFrame(
                [], "tbl string, n_rows long, total long"
            )
        frames = []
        for tbl in ("events_hourly", "events_by_type"):
            df = V.snapshot_read(spark, base, tbl)
            frames.append(
                df.agg(
                    F.lit(tbl).alias("tbl"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n").alias("total"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@register(
    "snapshot_incremental_read",
    oracle="""
    SELECT 'ord_by_status' AS tbl,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS total
    FROM orders WHERE o_orderkey % 2 = 1
    UNION ALL
    SELECT 'lines_by_flag',
           CAST(count(DISTINCT l_returnflag) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem WHERE l_orderkey % 2 = 1
    """,
)
def snapshot_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over the multi-table transaction store
    (sources.versioned.snapshot_changes): after the same two-txn
    roundtrip as atomic_multi_table_snapshot (even halves, then odd
    halves appended atomically), the incremental read between txn 1
    and txn 2 must contain EXACTLY the odd-half rollups of BOTH tables
    — the delta a downstream incremental consumer folds in instead of
    rescanning the snapshot, resolved purely from the two manifests'
    directory-list difference (no data diffing, no tombstones).  The
    oracle restates both deltas from the raw tables.  Overwrites
    between txns raise (a replacement is not an increment) —
    tested in tests/test_lakehouse_extras.py."""
    import shutil
    import tempfile

    from spark_monotasks_spark.sources import versioned as V

    t = _t(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="spark_graft_cdf_")
    try:
        orders, li = t["orders"], t["lineitem"]

        def halves(parity: int) -> dict[str, DataFrame]:
            return {
                "ord_by_status": orders.filter(
                    F.col("o_orderkey") % 2 == parity
                )
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n")),
                "lines_by_flag": li.filter(F.col("l_orderkey") % 2 == parity)
                .groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias("n")),
            }

        V.snapshot_commit(halves(0), base)
        V.snapshot_commit(halves(1), base)
        frames = []
        for tbl in ("ord_by_status", "lines_by_flag"):
            delta = V.snapshot_changes(spark, base, tbl, 1, 2)
            frames.append(
                delta.agg(
                    F.lit(tbl).alias("tbl"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n").alias("total"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _pq_codes_oracle_sql(
    dim: int = 64, n_sub: int = 4, n_cent: int = 8, seed: int = 7
) -> str:
    """PQ ENCODE (no ranking) of the whole embeddings table — the
    ann_pq_topk oracle's coded CTE standing alone, so the streamed
    index table can be value-compared against a batch re-encode."""
    from spark_monotasks_spark.pipeline.similarity import pq_codebook

    book = pq_codebook(dim, n_sub, n_cent, seed)
    sub_dim = dim // n_sub
    d_exprs = []
    for m in range(n_sub):
        lo, hi = m * sub_dim + 1, (m + 1) * sub_dim
        for c, cent in enumerate(book[m]):
            lits = "CAST([" + ",".join(repr(x) for x in cent) + "] AS DOUBLE[])"
            d_exprs.append(
                f"list_sum(list_transform(list_zip(embedding[{lo}:{hi}], {lits}),"
                " x -> (CAST(x[1] AS DOUBLE) - x[2])"
                f" * (CAST(x[1] AS DOUBLE) - x[2]))) AS d_{m}_{c}"
            )
    case_exprs = []
    for m in range(n_sub):
        whens = []
        for c in range(n_cent - 1):
            rest = [f"d_{m}_{cc}" for cc in range(c + 1, n_cent)]
            cmp = f"least({', '.join(rest)})" if len(rest) > 1 else rest[0]
            whens.append(f"WHEN d_{m}_{c} <= {cmp} THEN {c}")
        case_exprs.append(
            "CASE " + " ".join(whens) + f" ELSE {n_cent - 1} END AS code_{m}"
        )
    codes = ", ".join(f"code_{m}" for m in range(n_sub))
    return f"""
    WITH d AS (SELECT vec_id, {', '.join(d_exprs)} FROM embeddings),
    coded AS (SELECT vec_id, {', '.join(case_exprs)} FROM d)
    SELECT vec_id, {codes} FROM coded
    """


@register("stream_pq_index_maintenance", oracle=_pq_codes_oracle_sql())
def stream_pq_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index maintenance under streaming ingest: embedding batches
    arrive as a stream, each micro-batch PQ-ENCODES map-side
    (similarity.pq_encode — 4 codes/vector, the serving index) and
    commits exactly-once into a versioned codes table
    (streaming.dstream.versioned_append_sink), so the search index
    stays fresh without ever re-encoding history — the ingest-time
    posture a 100 TB vector deployment runs (encode once per vector,
    ever).  After the availableNow drain, the accumulated index table
    must equal a BATCH re-encode of the full corpus — the oracle is
    exactly the PQ-encode SQL, so streamed index == batch index is
    hash-proven, not assumed.  Replay idempotence comes from the
    versioned manifest's batch-id watermark (tested for the sink in
    tests/test_streaming.py)."""
    import os
    import shutil
    import tempfile

    from spark_monotasks_spark.pipeline import similarity
    from spark_monotasks_spark.sources import versioned as V
    from spark_monotasks_spark.streaming import dstream

    stage = tempfile.mkdtemp(prefix="stream_pqidx_")
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "embeddings.parquet")),
        os.path.join(indir, "embeddings.parquet"),
    )
    table = os.path.join(stage, "codes")
    try:
        stream = dstream.file_stream(
            spark,
            indir,
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema,
        )
        enc = similarity.pq_encode(stream, dim=64)
        q = (
            dstream.versioned_append_sink(
                enc, table, os.path.join(stage, "ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("pq index sink did not drain within 300s")
        if not V.list_versions(table):  # zero micro-batches (no input)
            return spark.createDataFrame(
                [], "vec_id long, code_0 int, code_1 int, code_2 int, code_3 int"
            )
        return V.read_version(spark, table).localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@register(
    "corpus_digest_diff",
    oracle="""
    WITH v0 AS (
      SELECT doc_id, text FROM documents
    ), v1 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 97 = 0 THEN text || ' [edited]'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 113 <> 0
    ), d0 AS (
      SELECT doc_id % 64 AS bucket, count(*) AS n_rows,
             md5(string_agg(md5(text), '' ORDER BY doc_id)) AS digest
      FROM v0 GROUP BY 1
    ), d1 AS (
      SELECT doc_id % 64 AS bucket, count(*) AS n_rows,
             md5(string_agg(md5(text), '' ORDER BY doc_id)) AS digest
      FROM v1 GROUP BY 1
    )
    SELECT bucket,
           CAST(coalesce(d0.n_rows, 0) AS BIGINT) AS n_rows_v0,
           CAST(coalesce(d1.n_rows, 0) AS BIGINT) AS n_rows_v1,
           CASE WHEN d0.digest IS NULL THEN 'only_v1'
                WHEN d1.digest IS NULL THEN 'only_v0'
                ELSE 'changed' END AS status
    FROM d0 FULL JOIN d1 USING (bucket)
    WHERE d0.digest IS NULL OR d1.digest IS NULL OR d0.digest <> d1.digest
    """,
)
def corpus_digest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-proportional corpus integrity diff (operators.layout.
    bucket_digests + digest_diff — Merkle-leaf comparison): two corpus
    versions reduce to one md5 digest per id-bucket (per-row hashes
    concatenated in id order), and comparing versions joins the two
    bucket-digest tables instead of the corpora — at 100 TB that's
    n_buckets 32-byte rows moved, not the text, with drill-down cost
    proportional to churn.  The entry builds a deterministic v1 twin
    in BOTH dialects (every 97th doc edited, every 113th deleted) and
    value-checks the changed-bucket report exactly — digest equality
    across engines proves the whole hash/order/concat lifecycle."""
    from spark_monotasks_spark.operators import layout

    docs = _t(spark, sf_dir)["documents"]
    v0 = docs.select("doc_id", "text")
    v1 = (
        docs.filter(F.col("doc_id") % 113 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 97 == 0,
                F.concat(F.col("text"), F.lit(" [edited]")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    d0 = layout.bucket_digests(v0, n_buckets=64)
    d1 = layout.bucket_digests(v1, n_buckets=64)
    return layout.digest_diff(d0, d1).orderBy("bucket")
