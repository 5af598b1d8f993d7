"""Similarity-serving catalog additions: IVF-PQ (the billion-vector
index shape — coarse cells + product-quantized residuals) and an ANN
recall@k evaluation entry that value-audits the approximate path
against the exact ranking inside one query.

Both follow the dyadic-literal playbook (ann_pq_topk / ann_ivf_topk,
queries/pipeline_queries.py): centroids, codebooks, and the query are
deterministic dyadic rationals, subtraction/multiplication of dyadic
doubles is exact, and every fold is written in the same left-to-right
order in both dialects — so the DuckDB oracle replays the FULL
approximate pipeline (assign -> residual -> encode -> ADC rank ->
recall join) value-for-value, not merely row counts.

Reference anchors (spark-monotasks): the reference has no vector
index; these are beyond-reference additions for the embedding-column
workloads a training-data pipeline runs (SURVEY §2 'similarity
search' block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_monotasks_spark.pipeline import similarity
from spark_monotasks_spark.queries.pipeline_queries import _ivf_assign_ctes
from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


def _lit_arr(vals: list[float]) -> str:
    return "CAST([" + ",".join(repr(x) for x in vals) + "] AS DOUBLE[])"


def _ivfpq_ctes(
    dim: int = 64,
    n_lists: int = 8,
    cell_seed: int = 5,
    n_sub: int = 4,
    n_cent: int = 8,
    book_seed: int = 7,
    n_probe: int = 3,
    qseed: int = 99,
) -> str:
    """Shared oracle fragment ending in ``est(vec_id, cell, code_m...,
    est_raw)``: IVF assignment (reusing ann_ivf_topk's CTEs), the
    probe-cell filter, the residual against the row's own cell
    centroid, the per-subspace argmin encode, and the per-cell ADC
    lookup — every constant a Python-computed dyadic literal identical
    to what the Spark builder inlines."""
    cents = similarity.ivf_literal_centroids(dim, n_lists, cell_seed)
    cent_map = {int(cid): vec for cid, vec in cents}
    qv = similarity.pq_query_vector(dim, qseed)
    probe = similarity.ivfpq_probe_cells(qv, cents, n_probe)
    book = similarity.pq_codebook(dim, n_sub, n_cent, book_seed)
    sub_dim = dim // n_sub

    cent_case = (
        "CASE cell "
        + " ".join(f"WHEN {cid} THEN {_lit_arr(cent_map[cid])}" for cid in probe[:-1])
        + f" ELSE {_lit_arr(cent_map[probe[-1]])} END"
    )
    d_exprs = []
    for m in range(n_sub):
        lo, hi = m * sub_dim + 1, (m + 1) * sub_dim
        for c, cent in enumerate(book[m]):
            d_exprs.append(
                f"list_sum(list_transform(list_zip(r[{lo}:{hi}], {_lit_arr(cent)}),"
                f" x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d_{m}_{c}"
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
    tables = {}
    for cid in probe:
        qres = [q - x for q, x in zip(qv, cent_map[cid])]
        tables[cid] = similarity.pq_adc_table(qres, dim, n_sub, n_cent, book_seed)

    def lookup(cid: int) -> str:
        return " + ".join(
            "(CAST(["
            + ",".join(repr(t) for t in tables[cid][m])
            + f"] AS DOUBLE[]))[code_{m} + 1]"
            for m in range(n_sub)
        )

    est_case = (
        "CASE cell "
        + " ".join(f"WHEN {cid} THEN {lookup(cid)}" for cid in probe[:-1])
        + f" ELSE {lookup(probe[-1])} END"
    )
    codes = ", ".join(f"code_{m}" for m in range(n_sub))
    probe_list = ", ".join(str(c) for c in probe)
    return f"""{_ivf_assign_ctes(cents)},
    cand AS (SELECT vec_id, embedding, cell FROM assigned
             WHERE cell IN ({probe_list})),
    res AS (SELECT vec_id, cell,
              list_transform(list_zip(embedding, {cent_case}),
                             p -> CAST(p[1] AS DOUBLE) - p[2]) AS r
            FROM cand),
    dd AS (SELECT vec_id, cell, {', '.join(d_exprs)} FROM res),
    coded AS (SELECT vec_id, cell, {', '.join(case_exprs)} FROM dd),
    est AS (SELECT vec_id, cell, {codes}, {est_case} AS est_raw FROM coded)"""


def _ivfpq_oracle_sql(k: int = 20, n_sub: int = 4) -> str:
    codes = ", ".join(f"code_{m}" for m in range(n_sub))
    return f"""
    WITH {_ivfpq_ctes()}
    SELECT vec_id, cell, {codes}, round(est_raw, 6) AS est_dist
    FROM est ORDER BY est_raw, vec_id LIMIT {k}
    """


@register("ann_ivfpq_topk", oracle=_ivfpq_oracle_sql())
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN serving (similarity.ivfpq_topk; Jégou et al. 2011 —
    the FAISS IVFADC shape): coarse dyadic cells + one shared PQ
    codebook over cell RESIDUALS; the query probes its 3 nearest cells
    and ranks members by per-cell asymmetric-distance lookups.  Index
    state is (cell, 4 codes) ≈ 5 bytes/vector — memory-resident at
    100 TB — and the scan touches ~3/8 of the corpus, codes only.
    Assign, residual, encode, probe choice, and ADC ranking are all
    exact dyadic arithmetic, so the DuckDB oracle replays the entire
    approximate pipeline value-for-value (_ivfpq_ctes)."""
    t = _t(spark, sf_dir)
    return similarity.ivfpq_topk(
        t["embeddings"], similarity.pq_query_vector(64, 99), k=20, dim=64
    )


def _recall_oracle_sql(k: int = 20) -> str:
    qlits = _lit_arr(similarity.pq_query_vector(64, 99))
    return f"""
    WITH {_ivfpq_ctes()},
    approx AS (SELECT vec_id FROM est ORDER BY est_raw, vec_id LIMIT {k}),
    exact AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               list_sum(list_transform(list_zip(embedding, {qlits}),
                        p -> (CAST(p[1] AS DOUBLE) - p[2])
                           * (CAST(p[1] AS DOUBLE) - p[2]))) AS d
        FROM embeddings
      ) ORDER BY d, vec_id LIMIT {k}
    )
    SELECT CAST({k} AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_hits,
           round(count(*) / {k}.0, 6) AS recall
    FROM approx JOIN exact USING (vec_id)
    """


@register("ann_recall_eval", oracle=_recall_oracle_sql())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@20 of the IVF-PQ path against the EXACT squared-L2 top-20
    — the evaluation every ANN deployment publishes before trusting an
    index, run as one distributed query: the approximate ranking
    (similarity.ivfpq_topk) inner-joins the exact ranking (one
    full-scan TakeOrderedAndProject) and the hit count becomes
    recall = |approx ∩ exact| / k.  Both rankings are deterministic
    dyadic arithmetic, so even this eval is value-replayed by the
    DuckDB oracle — the recall number itself is audited, not sampled.
    At scale the exact side is the only full-cost scan, which is
    exactly the offline-eval posture (ground truth computed once,
    on a sample of queries)."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qv = similarity.pq_query_vector(64, 99)
    approx = similarity.ivfpq_topk(emb, qv, k=20, dim=64).select("vec_id")
    qlit = F.array(*[F.lit(x) for x in qv])
    exact = (
        emb.select(
            "vec_id", similarity.sqdist(F.col("embedding"), qlit).alias("_d")
        )
        .orderBy("_d", "vec_id")
        .limit(20)
        .select("vec_id")
    )
    return approx.join(exact, on="vec_id", how="inner").agg(
        F.lit(20).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_hits"),
        F.round(F.count(F.lit(1)) / F.lit(20.0), 6).alias("recall"),
    )


def _batch_queries(n_q: int = 3, dim: int = 64) -> list[tuple[int, list[float]]]:
    """Deterministic dyadic query batch (seeds 97..): the serving tier
    amortizes one corpus scan across a BATCH of queries — the shape
    that matters at 100 TB, where per-query scans would multiply cost
    by the query rate."""
    return [
        (i, similarity.pq_query_vector(dim, seed=97 + i)) for i in range(n_q)
    ]


def _ann_batch_oracle_sql(k: int = 10) -> str:
    qs = _batch_queries()
    q_rows = " UNION ALL ".join(
        f"SELECT {qid} AS qid, {_lit_arr(qv)} AS qv" for qid, qv in qs
    )
    cos = (
        "list_sum(list_transform(list_zip(embedding, qv),"
        " p -> CAST(p[1] AS DOUBLE) * p[2]))"
        " / (sqrt(list_sum(list_transform(embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        " * sqrt(list_sum(list_transform(qv, x -> x * x))))"
    )
    return f"""
    WITH q AS ({q_rows}),
    s AS (SELECT qid, vec_id, round({cos}, 4) AS sim FROM embeddings, q),
    r AS (SELECT qid, vec_id, sim,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vec_id) AS rk
          FROM s)
    SELECT qid, vec_id, sim, CAST(rk AS INT) AS rk FROM r WHERE rk <= {k}
    """


@register("ann_batch_queries", oracle=_ann_batch_oracle_sql())
def ann_batch_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query ANN serving: ONE corpus scan scores a
    3-query batch (broadcast literal frame) and a per-query rank
    window returns each query's top-10 — Spark plans the rank filter
    as WindowGroupLimit (map-side per-partition heaps per qid), so the
    batch costs one scan + one bounded exchange instead of Q scans.
    This is the offline-serving shape (embedding search over a nightly
    batch of queries) that per-query TakeOrdered cannot amortize.
    Every cosine is the same fixed-order fold as ann_cosine_topk, so
    the whole batch is value-replayed by the oracle."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    qs = _batch_queries()
    q_frames = [
        spark.range(1).select(
            F.lit(qid).cast("int").alias("qid"),
            F.array(*[F.lit(x) for x in qv]).alias("qv"),
        )
        for qid, qv in qs
    ]
    q = q_frames[0]
    for f in q_frames[1:]:
        q = q.unionByName(f)
    scored = t["embeddings"].crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 4).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("qid", "vec_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH ex AS (
      SELECT CAST(u.i AS INT) AS dim, CAST(embedding[u.i + 1] AS DOUBLE) AS v
      FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    ),
    b AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY dim),
    coded AS (
      SELECT ex.dim, v, mn, mx,
             CASE WHEN mx > mn
                  THEN floor((v - mn) * 255 / (mx - mn) + 0.5)
                  ELSE 0 END AS code
      FROM ex JOIN b ON ex.dim = b.dim
    ),
    err AS (
      SELECT dim, mn, mx, code,
             abs(v - (CASE WHEN mx > mn
                           THEN mn + code * (mx - mn) / 255
                           ELSE mn END)) AS e
      FROM coded
    )
    SELECT dim, round(mn, 6) AS mn, round(mx, 6) AS mx,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
           round(avg(e), 8) AS avg_abs_err
    FROM err GROUP BY dim, mn, mx
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit of the embedding corpus — the
    storage decision every vector deployment makes before PQ (256-level
    per-dimension min/max grid = 4x smaller than float32 with ~0.2%
    grid error): per dimension, the corpus min/max bounds, the number
    of grid codes actually used, and the mean absolute reconstruction
    error of round-to-nearest coding.  Two linear passes over the
    posexploded (dim, value) stream (bounds aggregate, then a
    broadcast 64-row join-back — never a dim-partitioned window, whose
    partitions would be corpus/64-sized); code = floor(t + 0.5) rather
    than round() so half-way ties break identically in every engine.
    Constant dimensions (mx == mn) code to 0 with zero error by the
    same CASE in both dialects."""
    t = _t(spark, sf_dir)
    ex = t["embeddings"].select(
        F.posexplode("embedding").alias("dim", "_v")
    ).select("dim", F.col("_v").cast("double").alias("v"))
    b = ex.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    coded = ex.join(F.broadcast(b), on="dim").withColumn(
        "code",
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor((F.col("v") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn")) + 0.5),
        ).otherwise(F.lit(0)),
    )
    err = coded.withColumn(
        "e",
        F.abs(
            F.col("v")
            - F.when(
                F.col("mx") > F.col("mn"),
                F.col("mn") + F.col("code") * (F.col("mx") - F.col("mn")) / 255,
            ).otherwise(F.col("mn"))
        ),
    )
    return err.groupBy("dim", "mn", "mx").agg(
        F.countDistinct("code").alias("n_codes"),
        F.round(F.avg("e"), 8).alias("avg_abs_err"),
    ).select(
        "dim",
        F.round("mn", 6).alias("mn"),
        F.round("mx", 6).alias("mx"),
        "n_codes",
        "avg_abs_err",
    )


def _maxsim_oracle_sql(n_q: int = 3, group: int = 4, k: int = 15) -> str:
    """ann_maxsim_topk oracle: the same literal query vectors, the same
    vec_id//group document grouping, max-per-query-vector then sum —
    every dot product is the identical left-to-right fold in both
    dialects, the sum of maxima is <= n_q adds, rounded to 4."""
    from spark_monotasks_spark.pipeline.similarity import pq_query_vector

    qs = [pq_query_vector(64, 1000 + i) for i in range(n_q)]
    dots = []
    for i, q in enumerate(qs):
        lit = "CAST([" + ",".join(repr(x) for x in q) + "] AS DOUBLE[])"
        dots.append(
            f"max(list_sum(list_transform(list_zip(embedding, {lit}),"
            f" p -> CAST(p[1] AS DOUBLE) * p[2]))) AS m{i}"
        )
    total = " + ".join(f"m{i}" for i in range(n_q))
    return f"""
    WITH g AS (
      SELECT vec_id // {group} AS doc_id, {", ".join(dots)}
      FROM embeddings GROUP BY 1
    )
    SELECT doc_id, round({total}, 4) AS score
    FROM g ORDER BY score DESC, doc_id LIMIT {k}
    """


@register("ann_maxsim_topk", oracle=_maxsim_oracle_sql())
def ann_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) retrieval: documents are
    MULTI-VECTOR (here: vec_id//4 groups 4 vectors per pseudo-doc —
    the per-token embedding layout), and a multi-vector query scores a
    doc as sum over query vectors of the max dot product against any
    doc vector.  The serving shape 100 TB cares about: NO join and NO
    vector-pair explosion — each query vector is a dyadic LITERAL
    folded into the scan projection (3 dot products per row), and the
    whole MaxSim collapses in ONE hash aggregate (max per query vector,
    summed), then a bounded TakeOrdered top-k.  Per-dot folds run in
    identical left-to-right order in both dialects (the dyadic-literal
    playbook), so the oracle replays scores value-for-value."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = [similarity.pq_query_vector(64, 1000 + i) for i in range(3)]

    def dot(q):
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(x) for x in q]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = emb.select(
        (F.col("vec_id") / 4).cast("long").alias("doc_id"),
        *[dot(q).alias(f"d{i}") for i, q in enumerate(qs)],
    )
    g = scored.groupBy("doc_id").agg(
        *[F.max(f"d{i}").alias(f"m{i}") for i in range(3)]
    )
    score = F.round(F.col("m0") + F.col("m1") + F.col("m2"), 4)
    return (
        g.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(15)
    )


def _bitext_queries(n_q: int = 4, dim: int = 64) -> list[tuple[int, list[float]]]:
    """Deterministic dyadic 'source-language' query batch (seeds 2000..)
    for margin-based mining: at 100 TB these are the encoded source
    sentences of one mining shard."""
    return [
        (i, similarity.pq_query_vector(dim, seed=2000 + i))
        for i in range(n_q)
    ]


def _bitext_margin_oracle_sql(k: int = 4, thresh: str = "1.10") -> str:
    qs = _bitext_queries()
    q_rows = " UNION ALL ".join(
        f"SELECT {qid} AS qid, {_lit_arr(qv)} AS qv" for qid, qv in qs
    )
    cos = (
        "list_sum(list_transform(list_zip(embedding, qv),"
        " p -> CAST(p[1] AS DOUBLE) * p[2]))"
        " / (sqrt(list_sum(list_transform(embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        " * sqrt(list_sum(list_transform(qv, x -> x * x))))"
    )
    return f"""
    WITH q AS ({q_rows}),
    s AS (SELECT qid, vec_id, round({cos}, 4) AS sim FROM embeddings, q),
    r AS (SELECT qid, vec_id, sim,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vec_id) AS rk
          FROM s),
    p AS (SELECT qid,
                 max(CASE WHEN rk = 1 THEN vec_id END) AS best_vec_id,
                 max(CASE WHEN rk = 1 THEN sim END) AS m1,
                 max(CASE WHEN rk = 2 THEN sim END) AS m2,
                 max(CASE WHEN rk = 3 THEN sim END) AS m3,
                 max(CASE WHEN rk = 4 THEN sim END) AS m4
          FROM r WHERE rk <= {k} GROUP BY qid)
    SELECT qid, best_vec_id, m1 AS best_sim,
           round(m1 * 3 / ((m2 + m3) + m4), 6) AS margin,
           m1 * 3 / ((m2 + m3) + m4) >= {thresh} AS accepted
    FROM p
    """


@register("bitext_margin_mine", oracle=_bitext_margin_oracle_sql())
def bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based candidate mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER bitext-mining criterion): a batch of source-side
    query vectors scores the target corpus in ONE scan; each query's
    best hit is accepted only when its cosine clears the RATIO margin
    over the query's own neighborhood (best / mean of ranks 2..4) — the
    filter that separates a true translation pair from a merely-dense
    embedding region, and the step that turns ANN search into corpus
    ALIGNMENT.  Scale shape: identical to ann_batch_queries (bounded
    literal query broadcast + WindowGroupLimit per-qid heaps, so rank
    <= 4 never materializes a full sort), then the top-4 PIVOT to
    columns via conditional aggregation so the margin divides sums
    folded in the same literal order in both dialects — margin and the
    accept decision are value-replayed exactly by the oracle.
    Reference analogy: none — beyond-reference brief item (similarity
    search / multilingual curation family)."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    qs = _bitext_queries()
    q_frames = [
        spark.range(1).select(
            F.lit(qid).cast("int").alias("qid"),
            F.array(*[F.lit(x) for x in qv]).alias("qv"),
        )
        for qid, qv in qs
    ]
    q = q_frames[0]
    for f in q_frames[1:]:
        q = q.unionByName(f)
    scored = t["embeddings"].crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 4).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    ranked = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 4
    )
    p = ranked.groupBy("qid").agg(
        F.max(F.when(F.col("rk") == 1, F.col("vec_id"))).alias("best_vec_id"),
        F.max(F.when(F.col("rk") == 1, F.col("sim"))).alias("m1"),
        F.max(F.when(F.col("rk") == 2, F.col("sim"))).alias("m2"),
        F.max(F.when(F.col("rk") == 3, F.col("sim"))).alias("m3"),
        F.max(F.when(F.col("rk") == 4, F.col("sim"))).alias("m4"),
    )
    margin = F.col("m1") * 3 / ((F.col("m2") + F.col("m3")) + F.col("m4"))
    return p.select(
        "qid",
        "best_vec_id",
        F.col("m1").alias("best_sim"),
        F.round(margin, 6).alias("margin"),
        (margin >= 1.10).alias("accepted"),
    )
