"""Curation catalog additions: span-level benchmark decontamination,
epoch-capped mixture budgeting, and quality-aware near-dup survivor
selection — the three decisions a training-data pipeline makes after
dedup/quality scoring and before packing.

All oracle-backed: the md5 gram fingerprints make span scrubbing
exactly replayable (the exact_substring_spans playbook), the mixture
math is pure int64 with integer division, and the survivor choice
replays the portable MinHash clustering's recursive-CTE closure plus
an argmax window.

Reference anchors (spark-monotasks): none — beyond-reference
LLM-pipeline operators per the build brief, marked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_monotasks_spark.pipeline import dedup
from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


@register(
    "contamination_span_scrub",
    oracle="""
    WITH ref AS (SELECT text FROM documents WHERE doc_id % 7 = 0),
    corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
    rt AS (SELECT string_split(text, ' ') AS t FROM ref),
    rocc AS (
      SELECT DISTINCT md5(array_to_string(t[p+1:p+5], ' ')) AS fp
      FROM (SELECT t, unnest(generate_series(0, len(t) - 5)) AS p
            FROM rt WHERE len(t) >= 5)
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corp),
    pos AS (SELECT doc_id, unnest(generate_series(0, len(t) - 5)) AS p, t
            FROM toks WHERE len(t) >= 5),
    occ AS (SELECT doc_id, p, md5(array_to_string(t[p+1:p+5], ' ')) AS fp
            FROM pos),
    marked AS (SELECT doc_id, p FROM occ
               WHERE fp IN (SELECT fp FROM rocc)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN lag(p) OVER w IS NULL OR p > lag(p) OVER w + 5
                  THEN 1 ELSE 0 END AS f
      FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    grp AS (
      SELECT doc_id, p, sum(f) OVER (PARTITION BY doc_id ORDER BY p) AS g
      FROM isl
    ),
    spans AS (
      SELECT doc_id, min(p) AS s, max(p) + 4 AS e
      FROM grp GROUP BY doc_id, g
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(e - s + 1) AS BIGINT) AS tokens_removed,
             flatten(list(generate_series(s, e))) AS dp
      FROM spans GROUP BY doc_id
    )
    -- coalesce: DuckDB's array_to_string of an EMPTY list is NULL,
    -- Spark's concat_ws is '' — a fully-scrubbed doc must match
    SELECT per.doc_id, n_spans, tokens_removed,
           coalesce(array_to_string(
             [t[i] FOR i IN generate_series(1, len(t))
              IF NOT list_contains(dp, i - 1)], ' '), '') AS text_clean
    FROM per JOIN toks USING (doc_id)
    """,
)
def contamination_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination
    (pipeline.dedup.scrub_contaminated_spans): docs with
    ``doc_id % 7 == 0`` stand in for a held-out eval set; every
    maximal >=5-token run of the remaining corpus that the eval set
    contains verbatim is cut and the text rebuilt — keeping the clean
    bulk of documents that merely QUOTE a benchmark item, where the
    whole-doc ``contamination_check`` would drop them entirely.  The
    reference ships as a distinct md5-gram set (vocabulary-bounded:
    megabytes at 100 TB), the probe is one left-semi join of gram
    keys, and only token INDICES return to the doc partition.  Entry
    returns the affected docs; untouched docs pass through verbatim
    and are filtered here only to keep the result non-degenerate."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    ref = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    out = dedup.scrub_contaminated_spans(
        corpus, ref, min_tokens=5, fingerprint="md5"
    )
    return out.filter(F.col("tokens_removed") > 0).select(
        "doc_id", "n_spans", "tokens_removed", "text_clean"
    )


@register(
    "mixture_epoch_caps",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS k
      FROM per
    )
    SELECT source, tokens,
           CAST(t // 2 // k AS BIGINT) AS want_tokens,
           CAST(least(t // 2 // k, tokens * 4) AS BIGINT) AS achieved_tokens,
           CAST(least(t // 2 // k, tokens * 4) * 1000 // tokens AS BIGINT)
             AS epochs_x1000,
           (tokens * 4 < t // 2 // k) AS capped
    FROM per, tot
    """,
)
def mixture_epoch_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped mixture budgeting — the repetition-aware step of
    dataset mixing (Muennighoff et al. 2023: data repeated beyond ~4
    epochs stops helping): each source's uniform token allotment
    (budget = half the corpus, split k ways) is capped at 4 epochs of
    what the source actually has, and the achieved epochs ship as an
    exact integer permille.  Pure int64 arithmetic with integer
    division — no float enters — and the totals arrive via a broadcast
    1-row cross join, never a driver-side scalar.  One groupBy(source)
    at any scale; the weight table this emits is what
    temperature_mixture / mixture_sample_rows consume downstream."""
    t = _t(spark, sf_dir)
    per = t["documents"].groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("tokens")
    )
    tot = per.agg(
        F.sum("tokens").alias("_t"), F.count(F.lit(1)).alias("_k")
    )
    j = per.join(F.broadcast(tot))
    return j.select(
        "source",
        "tokens",
        F.expr("_t DIV 2 DIV _k").alias("want_tokens"),
        F.least(F.expr("_t DIV 2 DIV _k"), F.col("tokens") * 4).alias(
            "achieved_tokens"
        ),
        F.expr(
            "least(_t DIV 2 DIV _k, tokens * 4) * 1000 DIV tokens"
        ).alias("epochs_x1000"),
        (F.col("tokens") * 4 < F.expr("_t DIV 2 DIV _k")).alias("capped"),
    )


@register(
    "neardup_best_survivor",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS s
      FROM toks
    ), melt AS (
      SELECT doc_id, CAST(f.i AS INT) AS fam,
             list_min(list_transform(s, x ->
               CAST(('0x' || substr(md5(x || '#' || CAST(f.i AS VARCHAR)),
                                    1, 12)) AS BIGINT))) AS h
      FROM sh, UNNEST(range(0, 8)) AS f(i)
    ), edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM melt a JOIN melt b
        ON a.fam = b.fam AND a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 4
    ), sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), walk AS (
      SELECT src, dst FROM sym
      UNION
      SELECT w.src, s.dst FROM walk w JOIN sym s ON w.dst = s.src
    ), comp AS (
      SELECT src AS id, min(dst) AS mn FROM walk GROUP BY src
    ), clus AS (
      SELECT d.doc_id AS id,
             least(coalesce(c.mn, d.doc_id), d.doc_id) AS cluster,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ), ranked AS (
      SELECT id, cluster, n_chars,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_chars DESC, id) AS rn,
             count(*) OVER (PARTITION BY cluster) AS n_members,
             sum(n_chars) OVER (PARTITION BY cluster) AS sum_chars
      FROM clus
    )
    SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
           id AS survivor_id, n_chars AS survivor_chars,
           CAST(sum_chars - n_chars AS BIGINT) AS dropped_chars
    FROM ranked WHERE rn = 1 AND n_members >= 2
    """,
)
def neardup_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection over transitive near-dup
    clusters: production dedup keeps the BEST copy (here: most chars,
    id tiebreak), not the min-id copy the clustering convention emits
    — the choice that preserves the longest/cleanest variant of a
    boilerplate family.  Composes the fully-audited portable
    clustering (pipeline.dedup.near_duplicate_clusters_portable) with
    one per-cluster argmax window; the oracle replays signatures,
    banding, the recursive-CTE transitive closure, AND the survivor
    vote.  Only (id, cluster, n_chars) enters the window — text never
    shuffles; cluster sizes are near-dup-family-bounded, so the
    partitioned window is safe at any corpus scale."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    clusters = dedup.near_duplicate_clusters_portable(docs)
    clus = clusters.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), on="id"
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n_chars").desc(), "id")
    wc = Window.partitionBy("cluster")
    ranked = clus.select(
        "id",
        "cluster",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_members"),
        F.sum("n_chars").over(wc).alias("sum_chars"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            "cluster",
            "n_members",
            F.col("id").alias("survivor_id"),
            F.col("n_chars").alias("survivor_chars"),
            (F.col("sum_chars") - F.col("n_chars")).alias("dropped_chars"),
        )
    )


@register(
    "skipgram_pair_counts",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    p AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
      WHERE len(t) >= 2
      UNION ALL
      SELECT t[i] AS w1, t[i+2] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS s(i)
      WHERE len(t) >= 3
    )
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY w1, w2
    ORDER BY n DESC, w1, w2 LIMIT 20
    """,
)
def skipgram_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional skip-gram pair counts (window 2, directed) — the
    co-occurrence statistic word2vec/GloVe/PMI embedding training
    consumes, and the positional complement of the doc-level
    token_lift_pairs blocking.  Pairs are built MAP-SIDE as JVM
    struct arrays (one transform per offset — never a positions
    self-join, which would shuffle the posting list twice), so the
    only exchange is the final (w1, w2) count aggregate: 2x-tokens
    rows in, vocabulary²-bounded out, with map-side partial
    aggregation collapsing the head words before the shuffle.
    Top-20 with the (n, w1, w2) unique tiebreak."""
    t = _t(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)

    def pairs(off: int):
        return F.when(
            n > off,
            F.transform(
                F.sequence(F.lit(0), (n - 1 - off).cast("int")),
                lambda i: F.struct(
                    F.element_at(toks, i + 1).alias("w1"),
                    F.element_at(toks, i + 1 + off).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    pe = t["documents"].select(
        F.explode(F.concat(pairs(1), pairs(2))).alias("p")
    )
    return (
        pe.select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "audio_band_fingerprint",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS media_id,
             (doc_id % 5 + 1) * (8000 + (doc_id % 4) * 4000) // 10 AS n
      FROM documents WHERE doc_id < 300 AND doc_id % 3 = 2
    ),
    s AS (
      SELECT media_id, n,
             CAST(((i * 37) % 201) - 100 AS BIGINT) AS v,
             CAST(i // (n // 8) AS INT) AS band
      FROM ids, UNNEST(range(0, (n // 8) * 8)) AS t(i)
    ),
    e AS (
      SELECT media_id, n, band, sum(v * v) AS eb
      FROM s GROUP BY media_id, n, band
    ),
    d AS (
      SELECT media_id, n, band, eb,
             lag(eb) OVER (PARTITION BY media_id ORDER BY band) AS prev
      FROM e
    )
    SELECT media_id, CAST(max(n) AS BIGINT) AS n_samples,
           CAST(max(CASE WHEN band = 0 THEN eb END) AS BIGINT) AS e0,
           CAST(coalesce(sum(CASE WHEN band > 0 AND eb > prev
                                  THEN 1 << (band - 1) END), 0) AS INT)
             AS fp
    FROM d GROUP BY media_id
    """,
)
def audio_band_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-energy audio fingerprint over REAL decoded PCM16 clips
    (multimodal.audio_band_fingerprint; Haitsma–Kalker delta coding on
    the time axis): ramp WAVs are encoded distributed, RIFF-walked and
    sample-decoded back, split into 8 equal windows whose pure-int64
    energies delta-code into an 8-bit hash — and the oracle restates
    every energy and every bit from the generative closed form
    (sample i = ((i·37) mod 201) − 100), so the decode→frame→energy→
    bit path is value-audited end to end.  The fingerprint column is
    the blocking key an audio-dedup banding join would use; blobs
    never leave their partition."""
    from spark_monotasks_spark.pipeline import multimodal

    t = _t(spark, sf_dir)
    ids = t["documents"].filter(
        (F.col("doc_id") < 300) & (F.col("doc_id") % 3 == 2)
    ).select(F.col("doc_id").alias("media_id"))
    media = multimodal.media_from_ids(ids)
    return multimodal.audio_band_fingerprint(media)


@register(
    "lsh_banding_pr_eval",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh3 AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t)-2, 1))])
               AS s
      FROM toks
    ),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
      WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(a.s || b.s)), 6) >= 0.5
    ),
    shm AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS s
      FROM toks
    ),
    melt AS (
      SELECT doc_id, CAST(f.i AS INT) AS fam,
             list_min(list_transform(s, x ->
               CAST(('0x' || substr(md5(x || '#' || CAST(f.i AS VARCHAR)),
                                    1, 12)) AS BIGINT))) AS h
      FROM shm, UNNEST(range(0, 8)) AS f(i)
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM melt a JOIN melt b
        ON a.fam = b.fam AND a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 4
    ),
    m AS (
      SELECT (SELECT count(*) FROM cand) AS nc,
             (SELECT count(*) FROM truth) AS nt,
             (SELECT count(*) FROM cand JOIN truth USING (id_a, id_b)) AS tp
    )
    SELECT CAST(nc AS BIGINT) AS n_candidates,
           CAST(nt AS BIGINT) AS n_truth,
           CAST(tp AS BIGINT) AS tp,
           round(tp / CAST(nc AS DOUBLE), 6) AS prec,
           round(tp / CAST(nt AS DOUBLE), 6) AS recall
    FROM m
    """,
)
def lsh_banding_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash banding candidate stage against
    EXACT ground truth — the calibration every probabilistic-dedup
    deployment owes before trusting a (num_hashes, min_matches)
    setting: candidates = >=4-of-8 md5-family matches
    (pipeline.dedup.minhash_candidate_pairs_portable), truth = the
    LOSSLESS prefix-filtered exact Jaccard >= 0.5 join
    (dedup.jaccard_join_prefix, 3-token shingles), and the entry emits
    candidate/truth/overlap counts plus precision and recall — all
    value-audited, since BOTH sides are already exactly replayable
    (the two existing oracles composed, plus the intersection).  On
    this synthetic corpus the planted near-dups all sit at J >= 0.9
    against a < 0.1 background, so 1.0/1.0 is the TRUE answer (banding
    is genuinely lossless here) — the entry's value is that the metric
    machinery itself is hash-audited; on a real crawl the same query
    reports the real trade-off.  At scale both sides stay blocked
    (banding buckets / rarest-first prefixes); the metric join ships
    id pairs only."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    cand = dedup.minhash_candidate_pairs_portable(docs).select(
        "id_a", "id_b"
    )
    truth = dedup.jaccard_join_prefix(
        docs, threshold=0.5, shingle_k=3
    ).select("id_a", "id_b")
    nc = cand.agg(F.count(F.lit(1)).alias("nc"))
    nt = truth.agg(F.count(F.lit(1)).alias("nt"))
    tp = (
        cand.join(truth, on=["id_a", "id_b"])
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    m = nc.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(tp))
    return m.select(
        F.col("nc").alias("n_candidates"),
        F.col("nt").alias("n_truth"),
        "tp",
        F.round(F.col("tp") / F.col("nc").cast("double"), 6).alias("prec"),
        F.round(F.col("tp") / F.col("nt").cast("double"), 6).alias("recall"),
    )


@register(
    "weak_label_vote",
    oracle="""
    WITH lf AS (
      SELECT
        CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS lf_length,
        CASE WHEN length(text) - length(replace(text, ' ', '')) >= 60
             THEN 1 ELSE 0 END AS lf_tokens,
        CASE WHEN n_chars < 100 THEN NULL
             WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) <= 5
             THEN 1 ELSE 0 END AS lf_digits
      FROM documents
    ),
    voted AS (
      SELECT lf_length, lf_tokens, lf_digits,
             (lf_length + lf_tokens + coalesce(lf_digits, 0)) AS pos,
             ((1 - lf_length) + (1 - lf_tokens)
              + coalesce(1 - lf_digits, 0)) AS neg
      FROM lf
    ),
    labeled AS (
      SELECT lf_length, lf_tokens, lf_digits,
             CASE WHEN pos > neg THEN 1 WHEN pos < neg THEN 0 END AS vote
      FROM voted
    )
    SELECT 'lf_length' AS labeler,
           CAST(sum(lf_length) AS BIGINT) AS n_pos,
           CAST(sum(1 - lf_length) AS BIGINT) AS n_neg,
           CAST(0 AS BIGINT) AS n_abstain
    FROM labeled
    UNION ALL
    SELECT 'lf_tokens', CAST(sum(lf_tokens) AS BIGINT),
           CAST(sum(1 - lf_tokens) AS BIGINT), CAST(0 AS BIGINT)
    FROM labeled
    UNION ALL
    SELECT 'lf_digits', CAST(sum(lf_digits) AS BIGINT),
           CAST(sum(1 - lf_digits) AS BIGINT),
           CAST(sum(CASE WHEN lf_digits IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM labeled
    UNION ALL
    SELECT 'majority_vote', CAST(sum(vote) AS BIGINT),
           CAST(sum(1 - vote) AS BIGINT),
           CAST(sum(CASE WHEN vote IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM labeled
    """,
)
def weak_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision labeling (the Snorkel shape): three cheap
    deterministic labeling functions — a length rule, a token-count
    rule, and an ABSTAINING digit-density rule (votes only on docs
    >= 100 chars) — combine by majority vote with ties abstaining;
    the entry reports each LF's positive/negative/abstain counts plus
    the final vote distribution, the diagnostics (coverage, polarity)
    a labeling pipeline watches before training on the weak labels.
    One scan computes every LF as a codegen projection; the 4-way
    report is a single conditional aggregate (no per-labeler rescans
    — the unpivot is over aggregated scalars).  At 100 TB this is one
    AggregateExec; writing the voted label per doc is the same
    projection minus the final rollup."""
    t = _t(spark, sf_dir)
    lf_len = F.when(F.col("n_chars") >= 400, 1).otherwise(0)
    lf_tok = F.when(
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) >= 60, 1
    ).otherwise(0)
    lf_dig = F.when(F.col("n_chars") < 100, F.lit(None).cast("int")).otherwise(
        F.when(
            F.length(F.regexp_replace("text", "[^0-9]", "")) <= 5, 1
        ).otherwise(0)
    )
    lf = t["documents"].select(
        lf_len.alias("lf_length"),
        lf_tok.alias("lf_tokens"),
        lf_dig.alias("lf_digits"),
    )
    pos = F.col("lf_length") + F.col("lf_tokens") + F.coalesce(
        F.col("lf_digits"), F.lit(0)
    )
    neg = (
        (1 - F.col("lf_length"))
        + (1 - F.col("lf_tokens"))
        + F.coalesce(1 - F.col("lf_digits"), F.lit(0))
    )
    labeled = lf.withColumn(
        "vote",
        F.when(pos > neg, 1).when(pos < neg, 0).otherwise(
            F.lit(None).cast("int")
        ),
    )
    agg = labeled.agg(
        F.sum("lf_length").alias("len_pos"),
        F.sum(1 - F.col("lf_length")).alias("len_neg"),
        F.sum("lf_tokens").alias("tok_pos"),
        F.sum(1 - F.col("lf_tokens")).alias("tok_neg"),
        F.sum("lf_digits").alias("dig_pos"),
        F.sum(1 - F.col("lf_digits")).alias("dig_neg"),
        F.sum(F.when(F.col("lf_digits").isNull(), 1).otherwise(0)).alias(
            "dig_abs"
        ),
        F.sum("vote").alias("v_pos"),
        F.sum(1 - F.col("vote")).alias("v_neg"),
        F.sum(F.when(F.col("vote").isNull(), 1).otherwise(0)).alias("v_abs"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lf_length").alias("labeler"),
                    F.col("len_pos").alias("n_pos"),
                    F.col("len_neg").alias("n_neg"),
                    F.lit(0).cast("long").alias("n_abstain"),
                ),
                F.struct(
                    F.lit("lf_tokens").alias("labeler"),
                    F.col("tok_pos").alias("n_pos"),
                    F.col("tok_neg").alias("n_neg"),
                    F.lit(0).cast("long").alias("n_abstain"),
                ),
                F.struct(
                    F.lit("lf_digits").alias("labeler"),
                    F.col("dig_pos").alias("n_pos"),
                    F.col("dig_neg").alias("n_neg"),
                    F.col("dig_abs").alias("n_abstain"),
                ),
                F.struct(
                    F.lit("majority_vote").alias("labeler"),
                    F.col("v_pos").alias("n_pos"),
                    F.col("v_neg").alias("n_neg"),
                    F.col("v_abs").alias("n_abstain"),
                ),
            )
        ).alias("r")
    ).select("r.labeler", "r.n_pos", "r.n_neg", "r.n_abstain")


@register(
    "langid_confusion_eval",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        [
          {'score': len(list_intersect(t, ['der','die','das','und','zu',
                                           'in','ein','eine','ist','nicht'])),
           'lang': 'de'},
          {'score': len(list_intersect(t, ['the','a','of','and','to',
                                           'in','is','that','it','for'])),
           'lang': 'en'},
          {'score': len(list_intersect(t, ['el','la','de','y','que',
                                           'en','un','una','los','las'])),
           'lang': 'es'},
          {'score': len(list_intersect(t, ['le','la','de','et','que',
                                           'en','un','une','les','des'])),
           'lang': 'fr'},
          {'score': len(list_filter(['的','了','是','在','我',
                                     '有','和','就','不','人'],
                                    w -> contains(text, w))),
           'lang': 'zh'}
        ] AS sc
      FROM toks
    ), best AS (SELECT doc_id, lang, list_max(sc) AS b FROM scores),
    pred AS (
      SELECT lang,
             CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS pred_lang
      FROM best
    )
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS cell_acc_x1000
    FROM pred GROUP BY lang, pred_lang
    """,
)
def langid_confusion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the accuracy report behind the
    filter: declared vs predicted language counts from the
    oracle-audited stopword scorer (pipeline.text.language_id), with
    the per-cell indicator (1000 on the diagonal, 0 off it) kept as
    integer permille so the whole report is exact.  Composes the
    language_id_pred entry's scoring and adds one bounded groupBy
    (|langs|² cells) — the eval a pipeline publishes before trusting
    the predictor as a routing key.  One scan at any scale."""
    from spark_monotasks_spark.pipeline import text

    t = _t(spark, sf_dir)
    pred = text.language_id(t["documents"]).select("lang", "pred_lang")
    return pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) * 1000"
            " DIV count(*)"
        ).alias("cell_acc_x1000"),
    )


def _lsh_sweep_oracle_sql(ks=(1, 2, 4, 6)) -> str:
    pair_ctes = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh3 AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t)-2, 1))])
               AS s
      FROM toks
    ),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
      WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(a.s || b.s)), 6) >= 0.5
    ),
    shm AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS s
      FROM toks
    ),
    melt AS (
      SELECT doc_id, CAST(f.i AS INT) AS fam,
             list_min(list_transform(s, x ->
               CAST(('0x' || substr(md5(x || '#' || CAST(f.i AS VARCHAR)),
                                    1, 12)) AS BIGINT))) AS h
      FROM shm, UNNEST(range(0, 8)) AS f(i)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_match
      FROM melt a JOIN melt b
        ON a.fam = b.fam AND a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    flags AS (
      SELECT p.n_match,
             CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_true
      FROM pairs p LEFT JOIN truth t USING (id_a, id_b)
    ),
    nt AS (SELECT count(*) AS n_truth FROM truth)
    """
    selects = []
    for k in ks:
        selects.append(f"""
    SELECT CAST({k} AS INT) AS min_matches,
           CAST(count(*) FILTER (n_match >= {k}) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN n_match >= {k} THEN is_true ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(n_truth AS BIGINT) AS n_truth
    FROM flags, nt GROUP BY n_truth""")
    return (
        "WITH " + pair_ctes + " " + " UNION ALL ".join(selects)
    )


@register("lsh_threshold_sweep", oracle=_lsh_sweep_oracle_sql())
def lsh_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banding-threshold TUNING curve: candidate count and true
    positives at min_matches ∈ {1, 2, 4, 6} of 8 MinHash families,
    against the lossless exact-Jaccard >= 0.5 truth — computed from ONE
    banding pass (every threshold is a conditional aggregate over the
    same match-count relation, never a re-join per setting).  On this
    corpus the sweep is sharply informative: 1-of-8 admits ~30x the
    candidates of 4-of-8 at the same recall — precisely the trade a
    deployment reads off before picking its banding.  Composes the two
    independently-audited sides (minhash_candidate_pairs_portable +
    jaccard_join_prefix), so the whole curve is value-replayed by the
    oracle."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup.minhash_candidate_pairs_portable(docs, min_matches=1)
    truth = dedup.jaccard_join_prefix(docs, threshold=0.5, shingle_k=3).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    flags = pairs.join(truth, on=["id_a", "id_b"], how="left").select(
        "n_match", F.coalesce(F.col("_t"), F.lit(0)).alias("is_true")
    )
    ks = (1, 2, 4, 6)
    agg = flags.agg(
        *[
            F.sum(F.when(F.col("n_match") >= k, 1).otherwise(0)).alias(f"c{k}")
            for k in ks
        ],
        *[
            F.sum(
                F.when(F.col("n_match") >= k, F.col("is_true")).otherwise(0)
            ).alias(f"t{k}")
            for k in ks
        ],
    )
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    m = agg.crossJoin(F.broadcast(nt))
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("min_matches"),
                        F.col(f"c{k}").alias("n_candidates"),
                        F.col(f"t{k}").alias("tp"),
                        F.col("n_truth").alias("n_truth"),
                    )
                    for k in ks
                ]
            )
        ).alias("r")
    ).select("r.min_matches", "r.n_candidates", "r.tp", "r.n_truth")


@register(
    "video_content_neardup",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS id FROM documents
      WHERE doc_id % 4 = 2 AND doc_id < 200
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(2 + (a.id % 4) AS INT) AS n_frames,
           ((a.id < 100) = (b.id < 100)) AS same_bytes
    FROM ids a JOIN ids b ON a.id < b.id AND a.id % 12 = b.id % 12
    """,
)
def video_content_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video CONTENT dedup through REAL decode
    (multimodal.video_signature): synthesized AVIs repeat their frame
    content on id mod 12 while ids >= 100 re-encode at a DIFFERENT
    frame rate — so the corpus contains byte-identical duplicates AND
    container-different/content-identical ones.  The per-frame-aHash
    sequence signature (RIFF walk → baseline JPEG decode → exact
    integer aHash per frame) must find EXACTLY the mod-12 pairs (the
    closed-form oracle — the planted-truth pattern of
    image_ahash_neardup), and the riding ``same_bytes`` md5 control
    shows which of those pairs byte-level dedup would have MISSED
    (every cross-frame-rate pair) — the reason video dedup hashes
    content, not files.  Blobs never leave their partition; the join
    ships one short signature string per video."""
    from spark_monotasks_spark.pipeline import multimodal

    t = _t(spark, sf_dir)
    ids = t["documents"].filter(
        (F.col("doc_id") % 4 == 2) & (F.col("doc_id") < 200)
    ).select(F.col("doc_id").alias("media_id"))
    media = multimodal.video_from_ids(
        ids, fps_fn=lambda i: 10 if i < 100 else 20
    )
    sig = multimodal.video_signature(media).select(
        "media_id", "n_frames", "frame_sig", "blob_md5"
    )
    a = sig.select(
        F.col("media_id").alias("id_a"),
        F.col("n_frames").alias("n_frames"),
        F.col("frame_sig").alias("_sig"),
        F.col("blob_md5").alias("_md5_a"),
    )
    b = sig.select(
        F.col("media_id").alias("id_b"),
        F.col("frame_sig").alias("_sig"),
        F.col("blob_md5").alias("_md5_b"),
    )
    return (
        a.join(b, on="_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "n_frames",
            (F.col("_md5_a") == F.col("_md5_b")).alias("same_bytes"),
        )
    )


@register(
    "audio_content_neardup",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS id FROM documents
      WHERE doc_id % 3 = 2 AND doc_id < 300
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.id % 5 + 1) * (8000 + (a.id % 4) * 4000) // 10
                AS BIGINT) AS n_samples,
           ((a.id < 150) = (b.id < 150)) AS same_bytes
    FROM ids a JOIN ids b ON a.id < b.id AND a.id % 20 = b.id % 20
    """,
)
def audio_content_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio CONTENT dedup through REAL decode
    (multimodal.audio_content_signature): synthesized clips repeat
    their PCM content on id mod 20 while ids >= 150 carry an extra
    LIST metadata chunk — spec-valid container padding the RIFF walk
    skips — so the corpus holds byte-identical duplicates AND
    container-different/content-identical twins.  The decoded-content
    hash (md5 over rate, channels, raw samples) must recover EXACTLY
    the mod-20 pairs (closed-form oracle — the video_content_neardup
    pattern, completing content-vs-bytes dedup across image, audio,
    and video), and ``same_bytes`` shows which pairs byte hashing
    would have missed (every cross-padding pair).  Blobs never leave
    their partition; the join ships one 32-char hash per clip."""
    from spark_monotasks_spark.pipeline import multimodal

    t = _t(spark, sf_dir)
    ids = t["documents"].filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 300)
    ).select(F.col("doc_id").alias("media_id"))
    media = multimodal.audio_from_ids(
        ids,
        extra_chunk_fn=lambda i: (b"INFOpad-" + bytes(str(i % 20), "ascii"))
        if i >= 150
        else None,
    )
    sig = multimodal.audio_content_signature(media)
    a = sig.select(
        F.col("media_id").alias("id_a"),
        F.col("n_samples").alias("n_samples"),
        F.col("content_sig").alias("_sig"),
        F.col("blob_md5").alias("_md5_a"),
    )
    b = sig.select(
        F.col("media_id").alias("id_b"),
        F.col("content_sig").alias("_sig"),
        F.col("blob_md5").alias("_md5_b"),
    )
    return (
        a.join(b, on="_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "n_samples",
            (F.col("_md5_a") == F.col("_md5_b")).alias("same_bytes"),
        )
    )


@register(
    "pii_redact_stats",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             concat(text,
                    ' contact user', CAST(doc_id AS VARCHAR),
                    '@mail-', source, '.org',
                    CASE WHEN doc_id % 2 = 0
                         THEN concat(' call +1-555-',
                                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1),
                                     '23-4567')
                         ELSE '' END,
                    CASE WHEN doc_id % 5 = 0
                         THEN concat(' from 10.0.', CAST(doc_id % 256 AS VARCHAR),
                                     '.', CAST(doc_id % 254 + 1 AS VARCHAR))
                         ELSE '' END) AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(text,
               '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           len(regexp_extract_all(text,
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
             AS n_ips,
           substr(md5(
             regexp_replace(regexp_replace(regexp_replace(text,
               '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
               '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
               '[EMAIL]', 'g'),
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
               '[IP]', 'g')), 1, 16) AS redacted_fp
    FROM planted
    """,
)
def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-PII detection + redaction (pipeline.text.pii_scrub —
    the Dolma/FineWeb privacy pass: count and replace emails, phone
    numbers, and IPv4 literals in place, keeping the document).  The
    corpus is synthetic and PII-free, so the entry weaves deterministic
    PII into every document IN BOTH dialects (an email per doc, a
    +1-555 phone on evens, an RFC-1918 IP on multiples of 5 — one
    hex digit of md5(doc_id) inside the phone keeps the planted
    numbers non-uniform) and value-checks the per-type counts plus an
    md5 fingerprint of the redacted text, which proves the replacement
    byte-for-byte.  The patterns are lookaround-free so java.util.regex
    and RE2 agree exactly; one codegen projection, no shuffle — at
    100 TB this fuses into the scan."""
    from spark_monotasks_spark.pipeline import text as text_ops

    t = _t(spark, sf_dir)
    planted = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail-"),
            F.col("source"),
            F.lit(".org"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1),
                    F.lit("23-4567"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 254 + 1).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = text_ops.pii_scrub(planted, id_col="doc_id", text_col="text")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_emails",
        "n_phones",
        "n_ips",
        F.substring(F.md5(F.col("redacted").cast("binary")), 1, 16).alias(
            "redacted_fp"
        ),
    )


@register(
    "sft_turns_audit",
    oracle="""
    WITH convs AS (
      SELECT doc_id,
             concat('[{"role":"',
                    CASE WHEN doc_id % 5 = 0 THEN 'assistant' ELSE 'user' END,
                    '","content":"', substr(text, 1, 12), '"},',
                    '{"role":"',
                    CASE WHEN doc_id % 5 = 0 THEN 'user' ELSE 'assistant' END,
                    '","content":"reply one"}',
                    CASE WHEN doc_id % 3 >= 1
                         THEN ',{"role":"user","content":"follow up"}'
                         ELSE '' END,
                    CASE WHEN doc_id % 3 = 2
                         THEN ',{"role":"assistant","content":"reply two"}'
                         ELSE '' END,
                    ']') AS conv
      FROM documents
    ), turns AS (
      SELECT doc_id,
             CAST(u.i AS BIGINT) AS pos,
             json_extract_string(conv, '$[' || u.i || '].role') AS role,
             json_extract_string(conv, '$[' || u.i || '].content') AS content
      FROM convs,
           UNNEST(range(CAST(json_array_length(CAST(conv AS JSON)) AS BIGINT)))
             AS u(i)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           bool_and(role = CASE WHEN pos % 2 = 0
                                THEN 'user' ELSE 'assistant' END) AS roles_ok,
           CAST(coalesce(sum(CASE WHEN role = 'user'
                                  THEN length(content) END), 0) AS BIGINT)
             AS user_chars,
           CAST(coalesce(sum(CASE WHEN role = 'assistant'
                                  THEN length(content) END), 0) AS BIGINT)
             AS assistant_chars
    FROM turns GROUP BY doc_id
    """,
)
def sft_turns_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-data (SFT/chat) structural audit: conversations
    arrive as JSONL role/content turn arrays; the pipeline must parse
    them, validate STRICT role alternation (user first, then
    assistant, ...) and account characters per role before packing —
    malformed transcripts (assistant-first, doubled roles) are the #1
    data bug in instruction-tuning corpora.  The corpus is plain text,
    so the entry assembles a deterministic JSON conversation per
    document IN BOTH dialects (2-4 turns by doc_id%3; every 5th doc is
    deliberately assistant-first so roles_ok exercises both outcomes),
    parses with the ENGINE's JSON machinery (from_json to a typed
    array<struct> + posexplode in Spark; json_extract_string over a
    range lateral in DuckDB), and audits per doc.  Scale shape: parse +
    explode + one hash aggregate keyed by doc_id — no shuffle beyond
    the aggregate, JSON never leaves the JVM."""
    t = _t(spark, sf_dir)
    conv = F.concat(
        F.lit('[{"role":"'),
        F.when(F.col("doc_id") % 5 == 0, F.lit("assistant")).otherwise(
            F.lit("user")
        ),
        F.lit('","content":"'),
        F.substring("text", 1, 12),
        F.lit('"},{"role":"'),
        F.when(F.col("doc_id") % 5 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
        F.lit('","content":"reply one"}'),
        F.when(
            F.col("doc_id") % 3 >= 1,
            F.lit(',{"role":"user","content":"follow up"}'),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 2,
            F.lit(',{"role":"assistant","content":"reply two"}'),
        ).otherwise(F.lit("")),
        F.lit("]"),
    )
    parsed = t["documents"].select(
        "doc_id",
        F.from_json(
            conv, "array<struct<role:string,content:string>>"
        ).alias("turns"),
    )
    turns = parsed.select(
        "doc_id", F.posexplode("turns").alias("pos", "turn")
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("turn.role").alias("role"),
        F.col("turn.content").alias("content"),
    )
    expected = F.when(F.col("pos") % 2 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    return turns.groupBy("doc_id").agg(
        F.count("*").alias("n_turns"),
        F.bool_and(F.col("role") == expected).alias("roles_ok"),
        F.coalesce(
            F.sum(F.when(F.col("role") == "user", F.length("content"))),
            F.lit(0),
        ).alias("user_chars"),
        F.coalesce(
            F.sum(
                F.when(F.col("role") == "assistant", F.length("content"))
            ),
            F.lit(0),
        ).alias("assistant_chars"),
    )


@register(
    "sft_loss_mask_spans",
    oracle="""
    WITH convs AS (
      SELECT doc_id,
             concat('[{"role":"',
                    CASE WHEN doc_id % 5 = 0 THEN 'assistant' ELSE 'user' END,
                    '","content":"', substr(text, 1, 12), '"},',
                    '{"role":"',
                    CASE WHEN doc_id % 5 = 0 THEN 'user' ELSE 'assistant' END,
                    '","content":"reply one"}',
                    CASE WHEN doc_id % 3 >= 1
                         THEN ',{"role":"user","content":"follow up"}'
                         ELSE '' END,
                    CASE WHEN doc_id % 3 = 2
                         THEN ',{"role":"assistant","content":"reply two"}'
                         ELSE '' END,
                    ']') AS conv
      FROM documents
    ), turns AS (
      SELECT doc_id,
             CAST(u.i AS BIGINT) AS pos,
             json_extract_string(conv, '$[' || u.i || '].role') AS role,
             json_extract_string(conv, '$[' || u.i || '].content') AS content
      FROM convs,
           UNNEST(range(CAST(json_array_length(CAST(conv AS JSON)) AS BIGINT)))
             AS u(i)
    ), offs AS (
      SELECT doc_id, pos, role,
             CAST(coalesce(sum(length(content) + 1) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS span_start,
             CAST(length(content) AS BIGINT) AS clen
      FROM turns
    )
    SELECT doc_id, pos, span_start, span_start + clen AS span_end
    FROM offs WHERE role = 'assistant'
    """,
)
def sft_loss_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask span computation for SFT training: after flattening a
    role/content conversation into one training string (turns joined by
    a single separator char), the trainer masks loss to ASSISTANT spans
    only — this entry emits each assistant turn's [start, end) character
    offsets in the flattened string, the mask every instruction-tuning
    run materializes alongside the packed tokens.  Same deterministic
    conversations as sft_turns_audit (2-4 turns, every 5th doc
    assistant-first); offsets are a per-conversation running sum of
    (turn length + separator) over the turn index — a window
    partitioned by doc_id, whose partitions are conversation-sized
    (bounded), never corpus-sized.  Parsing stays engine-native JSON in
    both dialects."""
    t = _t(spark, sf_dir)
    conv = F.concat(
        F.lit('[{"role":"'),
        F.when(F.col("doc_id") % 5 == 0, F.lit("assistant")).otherwise(
            F.lit("user")
        ),
        F.lit('","content":"'),
        F.substring("text", 1, 12),
        F.lit('"},{"role":"'),
        F.when(F.col("doc_id") % 5 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
        F.lit('","content":"reply one"}'),
        F.when(
            F.col("doc_id") % 3 >= 1,
            F.lit(',{"role":"user","content":"follow up"}'),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 2,
            F.lit(',{"role":"assistant","content":"reply two"}'),
        ).otherwise(F.lit("")),
        F.lit("]"),
    )
    turns = (
        t["documents"]
        .select(
            "doc_id",
            F.from_json(
                conv, "array<struct<role:string,content:string>>"
            ).alias("turns"),
        )
        .select("doc_id", F.posexplode("turns").alias("pos", "turn"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.col("turn.role").alias("role"),
            F.length("turn.content").cast("long").alias("clen"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = turns.select(
        "doc_id",
        "pos",
        "role",
        F.coalesce(F.sum(F.col("clen") + 1).over(w), F.lit(0)).alias(
            "span_start"
        ),
        "clen",
    )
    return offs.filter(F.col("role") == "assistant").select(
        "doc_id",
        "pos",
        "span_start",
        (F.col("span_start") + F.col("clen")).alias("span_end"),
    )


@register(
    "dpo_pairs_audit",
    oracle="""
    WITH pairs AS (
      SELECT doc_id, source,
             substr(text, 1, 12) AS prompt,
             concat('answer ', CAST(doc_id % 7 AS VARCHAR),
                    repeat(' more detail', CAST(doc_id % 3 AS INT)))
               AS chosen,
             CASE WHEN doc_id % 9 = 0 THEN ''
                  WHEN doc_id % 6 = 0
                  THEN concat('answer ', CAST(doc_id % 7 AS VARCHAR),
                              repeat(' more detail', CAST(doc_id % 3 AS INT)))
                  ELSE concat('weak reply ', CAST(doc_id % 5 AS VARCHAR))
             END AS rejected
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT prompt) AS BIGINT) AS n_distinct_prompts,
           CAST(sum(CASE WHEN chosen = rejected THEN 1 ELSE 0 END)
                AS BIGINT) AS n_degenerate,
           CAST(sum(CASE WHEN length(rejected) = 0 OR length(chosen) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_side,
           round(sum(CASE WHEN chosen <> rejected AND length(rejected) > 0
                          AND length(chosen) > length(rejected)
                          THEN 1 ELSE 0 END) * 1.0
                 / sum(CASE WHEN chosen <> rejected AND length(rejected) > 0
                            THEN 1 ELSE 0 END), 6) AS chosen_longer_frac
    FROM pairs GROUP BY source
    """,
)
def dpo_pairs_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair (DPO/RLHF) dataset audit: before training on
    (prompt, chosen, rejected) triples a pipeline screens for the three
    standard defects — DEGENERATE pairs (chosen == rejected, zero
    gradient), EMPTY sides, and LENGTH BIAS (the fraction of valid
    pairs whose chosen response is longer — when far from 0.5 the
    reward signal is confounded with verbosity and the tuned model
    inflates output length).  Prompt-diversity (distinct prompts vs
    pairs) catches over-sampled prompts.  The corpus has no preference
    data, so the entry assembles deterministic triples IN BOTH dialects
    (every 6th doc degenerate, every 9th empty-rejected, response
    lengths varied by doc_id so the bias fraction is non-trivial) and
    audits per source.  Scale shape: one codegen projection + one hash
    aggregate — no shuffle beyond the group-by."""
    t = _t(spark, sf_dir)
    chosen = F.concat(
        F.lit("answer "),
        (F.col("doc_id") % 7).cast("string"),
        F.repeat(F.lit(" more detail"), (F.col("doc_id") % 3).cast("int")),
    )
    rejected = (
        F.when(F.col("doc_id") % 9 == 0, F.lit(""))
        .when(F.col("doc_id") % 6 == 0, chosen)
        .otherwise(
            F.concat(
                F.lit("weak reply "), (F.col("doc_id") % 5).cast("string")
            )
        )
    )
    pairs = t["documents"].select(
        "source",
        F.substring("text", 1, 12).alias("prompt"),
        chosen.alias("chosen"),
        rejected.alias("rejected"),
    )
    valid = (F.col("chosen") != F.col("rejected")) & (
        F.length("rejected") > 0
    )
    return pairs.groupBy("source").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("prompt").alias("n_distinct_prompts"),
        F.sum(
            F.when(F.col("chosen") == F.col("rejected"), 1).otherwise(0)
        ).alias("n_degenerate"),
        F.sum(
            F.when(
                (F.length("rejected") == 0) | (F.length("chosen") == 0), 1
            ).otherwise(0)
        ).alias("n_empty_side"),
        F.round(
            F.sum(
                F.when(
                    valid & (F.length("chosen") > F.length("rejected")), 1
                ).otherwise(0)
            )
            * 1.0
            / F.sum(F.when(valid, 1).otherwise(0)),
            6,
        ).alias("chosen_longer_frac"),
    )


@register(
    "dsir_importance_select",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x != '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])
               ELSE [] END) AS g
      FROM toks
    ), b AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 4096 AS bucket
      FROM grams
    ), raw AS (
      SELECT bucket, count(*) AS cr FROM b GROUP BY bucket
    ), tgt AS (
      SELECT bucket, count(*) AS ct FROM b WHERE source = 'src7'
      GROUP BY bucket
    ), tot AS (
      SELECT count(*) AS nr,
             count(*) FILTER (WHERE source = 'src7') AS nt
      FROM b
    ), lam AS (
      SELECT bucket,
             ln((coalesce(ct, 0) + 0.5) / (nt + 0.5 * 4096))
           - ln((cr + 0.5) / (nr + 0.5 * 4096)) AS lam
      FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    ), w AS (
      SELECT doc_id, source, round(avg(lam), 4) AS weight
      FROM b JOIN lam USING (bucket)
      GROUP BY doc_id, source
    ), r AS (
      SELECT doc_id, source, weight,
             row_number() OVER (ORDER BY weight DESC, doc_id) AS rk,
             count(*) OVER () AS n_scored
      FROM w
    )
    SELECT doc_id, source, weight FROM r
    WHERE rk <= ceil(n_scored * 0.25)
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (pipeline.text.
    dsir_importance_weights; Xie et al. 2023): treat source 'src7' as
    the high-quality target domain, score every document's md5-hashed
    bigram profile by mean ln p_target(b) − ln p_raw(b) (add-0.5
    smoothing over 4096 buckets), and keep the top 25% by weight —
    the classifier-free domain-targeting selection pass.  Fully
    value-audited: the oracle rebuilds the hashed buckets, both
    smoothed bucket models, the per-doc mean log-ratio (round(4)
    absorbing ln/order ulps — the scorer contract), and the ranked
    cut with doc_id tiebreak.  The λ table is bucket-bounded (≤4096
    rows) so the only corpus-scale operations are one gram explode
    and one bucket groupBy — the plan a 100 TB resampling pass needs."""
    t = _t(spark, sf_dir)
    from spark_monotasks_spark.pipeline import text as textmod

    w = textmod.dsir_importance_weights(t["documents"], target_source="src7")
    ranked = w.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("weight").desc(), F.col("doc_id")))
        .alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("n_scored"),
    )
    return ranked.filter(
        F.col("rk") <= F.ceil(F.col("n_scored") * 0.25)
    ).select("doc_id", "source", "weight")
