"""Round-8 catalog additions: monitoring/time-series analytics and
hybrid-retrieval fusion — CUSUM changepoint detection, exact sliding-
window distinct users, dyadic EWMA smoothing, time-weighted averages,
n-gram corpus diversity, reciprocal-rank fusion, and a Benford-law
data-quality audit.

Each entry follows the catalog contract (queries/__init__.py): a
PySpark builder plus a DuckDB oracle over the same parquet tables,
every float rounded and every top-k tiebroken so the driver's
order-insensitive value-hash compare is deterministic.

Exactness playbook (same as the r6/r7 batches): values scale to
integer cents, drift allowances ship as exact rationals multiplied
through (CUSUM), kernels use power-of-two weights (EWMA), and the few
genuinely-double expressions (RRF's 1/(k+rank), TWAP's final division)
are single operations on exactly-representable integers written as the
identical expression tree in both dialects.

Reference anchors (spark-monotasks): the reference's streaming stack
computes windowed counts (PairDStreamFunctions.scala
reduceByKeyAndWindow) but has no exact rolling-distinct, changepoint,
or fusion operators — these are beyond-reference additions, marked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


# ---------------------------------------------------------------------------
# Time-series monitoring
# ---------------------------------------------------------------------------

@register(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS d
      FROM daily
    ), pfx AS (
      SELECT day, n_orders, t,
             sum(d * n_orders - t) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS p
      FROM daily, tot
    ), cus AS (
      SELECT day, n_orders, t,
             p - least(0, min(p) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )) AS cusum
      FROM pfx
    )
    SELECT CAST(day AS TIMESTAMP) AS day, n_orders,
           CAST(cusum AS BIGINT) AS cusum,
           cusum > 5 * t AS alarm
    FROM cus
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection over daily order volume
    (operators.timeseries.cusum_detect; Page 1954 — beyond-reference
    monitoring surface: 'did ingest volume shift?' is the first alarm a
    100 TB corpus pipeline wires).  The recurrence S_t = max(0,
    S_{t-1} + x_t - k) is rewritten to its closed prefix-sum form
    S_t = P_t - min(0, running-min P), so two cumulative windows over
    the BOUNDED daily aggregate replace the unwindowable recursion.
    The allowance k = mean daily volume ships as the exact rational
    total/days multiplied through (y = days*x - total stays pure
    int64), and the totals arrive via a broadcast 1-row cross join —
    no driver-side scalar fetch.  Alarm: cumulative excess above the
    mean exceeding 5 average days' volume.  At 100 TB the windows see
    one row per day regardless of input size."""
    from spark_monotasks_spark.operators.timeseries import cusum_detect

    t = _t(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = daily.agg(
        F.sum("n_orders").alias("_t"), F.count(F.lit(1)).alias("_d")
    )
    staged = daily.join(F.broadcast(tot))
    out = cusum_detect(
        staged,
        "day",
        "n_orders",
        scale=F.col("_d"),
        target_num=F.col("_t"),
        keep_cols=("_t",),
    )
    # timestamp-typed key: the driver's pandas canonicalizer has a
    # proven in-window path for timestamps (events_hourly_window), not
    # for DATE (Spark yields datetime.date objects, DuckDB datetime64)
    return out.select(
        F.col("day").cast("timestamp").alias("day"),
        "n_orders",
        "cusum",
        (F.col("cusum") > F.lit(5) * F.col("_t")).alias("alarm"),
    )


@register(
    "sliding_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ), bounds AS (
      SELECT min(day) AS mn, max(day) AS mx FROM ud
    ), days AS (
      SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day,
           count(DISTINCT u.user_id) AS users_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per day, linear not
    quadratic (operators.timeseries.sliding_distinct — the rolling
    complement of cumulative_unique_users).  The oracle is the naive
    quadratic form (each day re-joins the trailing week and re-counts
    DISTINCT — fine at sf0.01, a 7× re-scan at 100 TB); the Spark side
    is the first-event-in-window decomposition: each distinct
    (user, day) with its per-user lag expands into ≤7 (window-end,
    contribution) rows checked locally, so the whole operator is one
    (user, day) dedup + one per-user window + one bounded explode +
    one count — every shuffle keyed, no window re-scan.  A value match
    proves the decomposition IS the rolling distinct."""
    from spark_monotasks_spark.operators.timeseries import sliding_distinct

    t = _t(spark, sf_dir)
    out = sliding_distinct(t["events"], "user_id", "ts", window_days=7)
    # timestamp-typed key for driver canonicalizer parity (see
    # cusum_changepoint)
    return out.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("n_keys").alias("users_7d"),
    )


@register(
    "ewma_dyadic_smooth",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), lagd AS (
      SELECT user_id, event_id, cents,
             lag(cents, 1) OVER w AS l1, lag(cents, 2) OVER w AS l2,
             lag(cents, 3) OVER w AS l3, lag(cents, 4) OVER w AS l4,
             lag(cents, 5) OVER w AS l5, lag(cents, 6) OVER w AS l6,
             lag(cents, 7) OVER w AS l7
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), summed AS (
      SELECT user_id, event_id, cents,
             cents * 128 + coalesce(l1, 0) * 64 + coalesce(l2, 0) * 32
               + coalesce(l3, 0) * 16 + coalesce(l4, 0) * 8
               + coalesce(l5, 0) * 4 + coalesce(l6, 0) * 2
               + coalesce(l7, 0) AS ewma_num,
             128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
                 + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
                 + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
                 + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
                 + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
                 + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
                 + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END AS ewma_den
      FROM lagd
    )
    SELECT user_id, event_id, cents,
           CAST(ewma_num AS BIGINT) AS ewma_num,
           CAST(ewma_den AS BIGINT) AS ewma_den,
           round(ewma_num / ewma_den / 100.0, 4) AS ewma
    FROM summed
    """,
)
def ewma_dyadic_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing of purchase values with a DYADIC 8-tap
    kernel (operators.timeseries.ewma_dyadic; alpha = 1/2) — the
    dyadic playbook applied to the one classic smoother no two engines
    reproduce as a float recurrence: integer cents × power-of-two
    weights keep numerator and denominator exact int64, so DuckDB
    replays the smoothed series bit-for-bit.  One hash exchange on
    user_id serves all 8 lag expressions (one window, JVM-side fold);
    output rows = input rows, no Python, no second shuffle."""
    from spark_monotasks_spark.operators.timeseries import ewma_dyadic

    t = _t(spark, sf_dir)
    purchases = t["events"].filter(F.col("event_type") == "purchase")
    out = ewma_dyadic(
        purchases, "user_id", "ts", "value", "event_id", taps=8
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("tiebreak").alias("event_id"),
        "cents",
        "ewma_num",
        "ewma_den",
        "ewma",
    )


@register(
    "twap_event_value",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec
      FROM events
    ), d AS (
      SELECT user_id, cents,
             lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - sec AS dur
      FROM s
    )
    SELECT user_id,
           CAST(sum(cents * dur) AS BIGINT) AS twap_num,
           CAST(sum(dur) AS BIGINT) AS twap_den,
           round(sum(cents * dur) / sum(dur) / 100.0, 4) AS twap
    FROM d WHERE dur IS NOT NULL
    GROUP BY user_id
    """,
)
def twap_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average event value (operators.
    timeseries.time_weighted_avg) — the irregular-series average that
    plain AVG gets wrong (a value held for an hour must weigh 3600×
    one held a second; the metrics/finance TWAP staple).  Each value
    is held until the user's next event and weighted by the holding
    duration in whole seconds; integer cents × integer seconds keep
    both accumulators exact int64.  One exchange on user_id serves the
    lead window AND the grouped sum (same partitioning, no second
    exchange)."""
    from spark_monotasks_spark.operators.timeseries import time_weighted_avg

    t = _t(spark, sf_dir)
    out = time_weighted_avg(t["events"], "user_id", "ts", "value", "event_id")
    return out.select(
        F.col("key").alias("user_id"), "twap_num", "twap_den", "twap"
    )


# ---------------------------------------------------------------------------
# Corpus diversity / retrieval fusion / data-quality audit
# ---------------------------------------------------------------------------

@register(
    "ngram_diversity_by_source",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT source,
             unnest(list_transform(range(greatest(len(t) - 2, 0)),
                                   i -> array_to_string(t[i+1:i+3], ' ')))
               AS g
      FROM toks
    ), gstats AS (
      SELECT source,
             count(*) AS total_trigrams,
             count(DISTINCT g) AS distinct_trigrams
      FROM grams GROUP BY source
    ), tstats AS (
      SELECT source, CAST(sum(len(t)) AS BIGINT) AS total_tokens
      FROM toks GROUP BY source
    )
    SELECT g.source AS source, total_tokens, total_trigrams,
           distinct_trigrams,
           round(distinct_trigrams / total_trigrams, 6) AS trigram_diversity
    FROM gstats g JOIN tstats USING (source)
    """,
)
def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trigram diversity (type-token ratio on word
    trigrams) — the repetitiveness / template-content health metric a
    crawl mix is monitored by (low diversity = boilerplate-heavy
    source; the corpus-level cousin of the per-doc repetition_stats
    entry).  Grams come from the shifted-slice zip_with fold
    (pipeline.text.ngram_fold — one O(len) JVM pass per shift, no
    Python); the only shuffle ships (source, gram) pairs for the
    distinct-count, and the token totals ride a separate narrow
    aggregate joined at source granularity (bounded).  At 100 TB the
    gram stream dominates — it is exactly one explode wide, and the
    distinct-aggregate map-side-combines within each source."""
    from spark_monotasks_spark.pipeline.text import ngram_fold, tokens

    t = _t(spark, sf_dir)
    toks = t["documents"].select(
        "source", tokens("text").alias("_t")
    )
    grams = toks.select(
        "source", F.explode(ngram_fold(F.col("_t"), 3)).alias("g")
    )
    gstats = grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_trigrams"),
        F.countDistinct("g").alias("distinct_trigrams"),
    )
    tstats = toks.groupBy("source").agg(
        F.sum(F.size("_t")).alias("total_tokens")
    )
    return (
        gstats.join(tstats, on="source")
        .select(
            "source",
            "total_tokens",
            "total_trigrams",
            "distinct_trigrams",
            F.round(
                F.col("distinct_trigrams") / F.col("total_trigrams"), 6
            ).alias("trigram_diversity"),
        )
    )


@register(
    "rrf_fusion_topk",
    oracle="""
    WITH ra AS (
      SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id)
               AS rank
      FROM (SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 100)
    ), rb AS (
      SELECT doc_id, row_number() OVER (ORDER BY n_tokens DESC, doc_id)
               AS rank
      FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
            ORDER BY len(string_split(text, ' ')) DESC, doc_id LIMIT 100)
    ), f AS (
      SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
             coalesce(1.0 / (60 + ra.rank), 0)
               + coalesce(1.0 / (60 + rb.rank), 0) AS s
      FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, round(s, 6) AS rrf_score
    FROM f ORDER BY round(s, 6) DESC, doc_id LIMIT 20
    """,
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of two retrieval rankings (pipeline.
    similarity.rrf_fuse; Cormack et al. 2009 — the hybrid-retrieval
    combiner that merges a lexical and a dense candidate list without
    score calibration).  Ranking A: documents by length; ranking B: by
    token count — both top-100-truncated FIRST (TakeOrderedAndProject,
    bounded priority queues), then ranked by a row_number whose input
    is the bounded Limit (the plan-gate-legal un-partitioned window),
    full-outer fused, and top-20 selected on the rounded fused score
    with a doc_id tiebreaker.  Each RRF term is one double division of
    exact integers summed left-to-right — the identical expression
    tree DuckDB evaluates, so the fusion matches bit-for-bit.  At
    scale the fused lists are per-query bounded (≤k each): the fusion
    costs a broadcast-sized join regardless of corpus size."""
    from spark_monotasks_spark.pipeline.similarity import rrf_fuse

    t = _t(spark, sf_dir)
    docs = t["documents"]
    top_a = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(100)
    )
    ra = top_a.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rank"),
    )
    with_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    top_b = with_tok.orderBy(F.col("n_tokens").desc(), "doc_id").limit(100)
    rb = top_b.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("n_tokens").desc(), "doc_id"))
        .alias("rank"),
    )
    fused = rrf_fuse([ra, rb], id_col="doc_id", k=60)
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(20)


@register(
    "benford_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n
      FROM orders WHERE o_totalprice >= 1.0
      GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM digits
    )
    SELECT digit, n, round(n / t, 6) AS obs_share,
           CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
                           WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
                           WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
                           WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
                           WHEN 9 THEN 0.045757 END AS DOUBLE)
             AS benford_share,
           round(abs(round(n / t, 6)
                     - CAST(CASE digit
                            WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
                            WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
                            WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
                            WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
                            WHEN 9 THEN 0.045757 END AS DOUBLE)), 6)
             AS abs_dev
    FROM digits, tot
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / unit-mixup screen a data-quality layer runs on
    monetary columns (synthetic uniform prices will FAIL Benford
    loudly; the deviation column is the diagnostic, not a pass
    threshold).  The first significant digit comes from exact integer
    string arithmetic (floor → int64 → first char — no log10 on the
    data path), expected shares are literal constants in BOTH dialects
    (log10 ulps never cross engines), and the digit histogram is 9
    rows — the totals cross join is a broadcast of an aggregate.  One
    scan, one 9-group aggregate at any scale."""
    t = _t(spark, sf_dir)
    digits = (
        t["orders"]
        .filter(F.col("o_totalprice") >= 1.0)
        .groupBy(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("_t"))
    benford = F.create_map(
        *[
            x
            for d, s in [
                (1, 0.301030), (2, 0.176091), (3, 0.124939),
                (4, 0.096910), (5, 0.079181), (6, 0.066947),
                (7, 0.057992), (8, 0.051153), (9, 0.045757),
            ]
            for x in (F.lit(d), F.lit(s))
        ]
    )
    obs = F.round(F.col("n") / F.col("_t"), 6)
    exp = F.element_at(benford, F.col("digit").cast("int"))
    return digits.join(F.broadcast(tot)).select(
        "digit",
        "n",
        obs.alias("obs_share"),
        exp.alias("benford_share"),
        F.round(F.abs(obs - exp), 6).alias("abs_dev"),
    )


@register(
    "image_ahash_neardup",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS id_a,
           CAST(doc_id + 1 AS BIGINT) AS id_b,
           CAST(0 AS INT) AS hamming
    FROM documents WHERE doc_id % 2 = 0 AND doc_id < 400
    """,
)
def image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection via perceptual hashing — the
    multimodal counterpart of the MinHash/SimHash text dedup family
    (pipeline.multimodal.image_ahash + ahash_near_duplicates): REAL
    PNG encode → decode → exact-integer average-hash → 4-band LSH
    self-join → popcount verify.  Ground truth is PLANTED (the
    doc_redact playbook): ids 2k/2k+1 render the same seeded noise
    image, the odd one byte-perturbed by an intensity-preserving ±1
    channel swap, so every planted pair aHash-collides BY CONSTRUCTION
    and the oracle states the pair list in closed form — a value match
    proves the whole decode→hash→banding pipeline end-to-end.  At
    100 TB only 8-byte hashes ever shuffle (pixels stay in their
    partitions), and banding bounds the candidate volume exactly like
    the text-side LSH."""
    from spark_monotasks_spark.pipeline.multimodal import (
        ahash_near_duplicates,
        image_ahash,
        noise_media_from_ids,
    )

    t = _t(spark, sf_dir)
    ids = (
        t["documents"]
        .filter(F.col("doc_id") < 400)
        .select(F.col("doc_id").alias("media_id"))
    )
    media = noise_media_from_ids(ids)
    hashes = image_ahash(media)
    pairs = ahash_near_duplicates(hashes, bands=4, max_hamming=0)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Event-stream hygiene / product analytics (r8 second batch)
# ---------------------------------------------------------------------------

@register(
    "event_debounce",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) // 600 AS w
      FROM events
    ), r AS (
      SELECT event_id, user_id,
             row_number() OVER (
               PARTITION BY user_id, w ORDER BY ts, event_id
             ) AS rn
      FROM b
    )
    SELECT event_id, user_id FROM r WHERE rn = 1
    """,
)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event debouncing (operators.timeseries.debounce) — the
    clickstream/telemetry chatter filter: per user and 10-minute
    tumbling window keep only the earliest event, so double-fires and
    sensor bursts collapse before sessionization.  One shuffle on
    (user, window), one rank filter (Catalyst bounds it via
    LimitPushDownThroughWindow); the strict anchored recurrence is
    inherently sequential, the tumbling form is what production
    metrics systems ship (at-most-2-per-burst guarantee documented on
    the operator)."""
    from spark_monotasks_spark.operators.timeseries import debounce

    t = _t(spark, sf_dir)
    kept = debounce(t["events"], "user_id", "ts", "event_id",
                    min_gap_seconds=600)
    return kept.select("event_id", "user_id")


@register(
    "event_rate_limit",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id, event_type, ts,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS w
      FROM events
    ), r AS (
      SELECT event_id, user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id, w ORDER BY ts, event_id
             ) AS rn
      FROM b
    )
    SELECT event_id, user_id, event_type FROM r WHERE rn <= 2
    """,
)
def event_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rate limiting (operators.timeseries.rate_limit): at most
    2 events per user per hour survive (earliest-first, deterministic
    tiebreak) — the ingestion fairness cap that stops one hot key from
    flooding a 100 TB event pipeline.  Same one-shuffle rank shape as
    the debounce entry with a k-per-window filter."""
    from spark_monotasks_spark.operators.timeseries import rate_limit

    t = _t(spark, sf_dir)
    kept = rate_limit(t["events"], "user_id", "ts", "event_id",
                      window_seconds=3600, max_per_window=2)
    return kept.select("event_id", "user_id", "event_type")


@register(
    "event_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS cur_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ), pairs AS (
      SELECT cur_type, next_type, count(*) AS n
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY cur_type, next_type
    )
    SELECT cur_type, next_type, CAST(n AS BIGINT) AS n,
           round(n / sum(n) OVER (PARTITION BY cur_type), 6) AS p
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — P(next event type | current), the product-analytics
    staple behind flow diagrams and next-action models (also the
    co-click graph builder's sequential cousin).  One exchange on
    user_id for the lead window; the pair counts collapse to the
    |types|² matrix, and the row-normalizing window runs on that
    BOUNDED aggregate (25 rows here) — gate-legal and free at any
    corpus scale."""
    t = _t(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = t["events"].select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    pairs = (
        nxt.filter(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("cur_type")
    return pairs.select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Retrieval completeness: conjunctive + positional phrase search
# ---------------------------------------------------------------------------

@register(
    "conjunctive_search",
    oracle="""
    WITH posting AS (
      SELECT doc_id, w, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w IN ('join', 'hash', 'scan')
      GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS total_tf
    FROM posting
    GROUP BY doc_id
    HAVING count(*) = 3
    """,
)
def conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) multi-term search via posting-list
    intersection — the boolean-retrieval core the BM25/TF-IDF entries
    rank on top of: docs containing ALL of {join, hash, scan}.  The
    posting build is one explode + one (doc, term) count; the
    intersection is a count-of-matched-terms HAVING — no join chain,
    no per-term scan.  At 100 TB the filter prunes the exploded stream
    to query terms BEFORE any shuffle (predicate on the generator
    output), so shuffled volume is bounded by matching postings, not
    corpus tokens."""
    t = _t(spark, sf_dir)
    terms = ["join", "hash", "scan"]
    posting = (
        t["documents"]
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        posting.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_nt"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("_nt") == len(terms))
        .select("doc_id", "total_tf")
    )


@register(
    "phrase_search_positional",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(range(len(string_split(text, ' ')))) AS pos
      FROM documents
    )
    SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM (SELECT doc_id, pos FROM p WHERE w = 'table') a
    JOIN (SELECT doc_id, pos FROM p WHERE w = 'hash') b
      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY a.doc_id
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("table hash") on a POSITIONAL inverted
    index — the adjacency join over (term, doc, position) postings
    that separates a search engine from a bag-of-words ranker.  Each
    side of the join is the pruned posting list of ONE term (filter
    pushed below the position explode), and the adjacency test is a
    pure equi-join on (doc_id, pos+1) — hash join, no inequality scan.
    At scale posting lists are term-bounded, so the join cost follows
    query-term frequency, never corpus size."""
    t = _t(spark, sf_dir)
    pos = t["documents"].select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    a = pos.filter(F.col("w") == "table").select(
        "doc_id", (F.col("pos") + 1).alias("_next")
    )
    b = pos.filter(F.col("w") == "hash").select("doc_id", "pos")
    return (
        a.join(b, on=[a["doc_id"] == b["doc_id"], a["_next"] == b["pos"]])
        .groupBy(a["doc_id"].alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# Coreset / diversity selection
# ---------------------------------------------------------------------------

def _sqdist_sql(a: str, b: str) -> str:
    """DuckDB replica of similarity.sqdist: Σ (aᵢ-bᵢ)² with per-element
    DOUBLE casts and list_sum's left-to-right fold — the same fixed
    evaluation order as the Spark zip_with/aggregate pair, so the
    distance is bit-identical cross-engine."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        f"* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )


def _kcenter_oracle(k: int = 4) -> str:
    """Unrolled greedy k-center rounds as CTE stages (the BPE
    list_reduce playbook): stage s_r picks the argmax-distance row of
    d_{r-1}, stage d_r folds the new center into the running least."""
    parts = [
        "WITH e AS (SELECT vec_id, embedding FROM embeddings)",
        ", s0 AS (SELECT vec_id AS cid, embedding AS cvec FROM e"
        " ORDER BY vec_id LIMIT 1)",
        f", d0 AS (SELECT e.vec_id, e.embedding,"
        f" {_sqdist_sql('e.embedding', 's0.cvec')} AS md FROM e, s0)",
    ]
    for r in range(1, k):
        prev = f"d{r - 1}"
        parts.append(
            f", s{r} AS (SELECT vec_id AS cid, embedding AS cvec, md"
            f" FROM {prev} ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if r < k - 1:
            parts.append(
                f", d{r} AS (SELECT {prev}.vec_id, {prev}.embedding,"
                f" least({prev}.md,"
                f" {_sqdist_sql(prev + '.embedding', f's{r}.cvec')}) AS md"
                f" FROM {prev}, s{r})"
            )
    selects = [
        "SELECT 0 AS sel_round, cid AS vec_id,"
        " CAST(0.0 AS DOUBLE) AS radius FROM s0"
    ]
    for r in range(1, k):
        selects.append(
            f"SELECT {r}, cid, round(md, 4) FROM s{r}"
        )
    return "".join(parts) + " " + " UNION ALL ".join(selects)


@register("kcenter_coreset", oracle=_kcenter_oracle(4))
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embeddings table
    (pipeline.similarity.kcenter_select; Gonzalez 1985 farthest-point
    traversal, the 2-approximation diversity selector) — the
    data-selection operator that picks maximally-spread exemplars for
    eval probes / few-shot pools / dedup seeds.  Fully distributed: the
    running nearest-selected-center distance is a `least` column, each
    round broadcasts ONLY the 1-row newest center and takes the argmax
    via TakeOrderedAndProject — O(k·n) distance evaluations, the serial
    algorithm's exact work.  Fixed-order double folds (sqdist) make
    every argmax choice and radius bit-reproducible, so the oracle
    replays the greedy rounds as unrolled CTE stages — the same
    playbook that oracle-backed the BPE merge learning."""
    from spark_monotasks_spark.pipeline.similarity import kcenter_select

    t = _t(spark, sf_dir)
    return kcenter_select(t["embeddings"], k=4)


# ---------------------------------------------------------------------------
# Forecast-quality monitoring / keyword extraction / bounded funnel
# ---------------------------------------------------------------------------

@register(
    "seasonal_naive_mase",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ), lagd AS (
      SELECT priority, n,
             lag(n, 7) OVER w AS l7,
             lag(n, 1) OVER w AS l1
      FROM daily WINDOW w AS (PARTITION BY priority ORDER BY day)
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(n - l7)) AS BIGINT) AS err_seasonal,
           CAST(sum(abs(n - l1)) AS BIGINT) AS err_naive,
           round(sum(abs(n - l7)) / sum(abs(n - l1)), 6) AS mase
    FROM lagd WHERE l7 IS NOT NULL AND l1 IS NOT NULL
    GROUP BY priority
    """,
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast error (MASE denominator/numerator pair,
    Hyndman & Koehler 2006) per order priority — the forecast-quality
    baseline every volume-monitoring pipeline publishes: how much
    better is 'same as 7 observations ago' than 'same as yesterday'?
    MASE < 1 means weekly seasonality carries real signal.  Lags are
    ROW-lagged over each priority's observed daily series (documented:
    series index, not calendar offset — identical semantics in both
    engines).  All errors are exact integer counts; the ratio is one
    double division.  The lag window runs on the bounded (priority,
    day) aggregate — at 100 TB this whole query is the daily groupBy."""
    t = _t(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("priority").orderBy("day")
    lagd = daily.select(
        "priority",
        "n",
        F.lag("n", 7).over(w).alias("l7"),
        F.lag("n", 1).over(w).alias("l1"),
    ).filter(F.col("l7").isNotNull() & F.col("l1").isNotNull())
    err_s = F.sum(F.abs(F.col("n") - F.col("l7")))
    err_n = F.sum(F.abs(F.col("n") - F.col("l1")))
    return lagd.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        err_s.alias("err_seasonal"),
        err_n.alias("err_naive"),
        F.round(err_s / err_n, 6).alias("mase"),
    )


@register(
    "doc_keywords_topk",
    oracle="""
    WITH posting AS (
      SELECT doc_id, w, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w
    ), dfreq AS (
      SELECT w, count(*) AS df FROM posting GROUP BY w
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
      SELECT p.doc_id, p.w, p.tf, d.df,
             row_number() OVER (
               PARTITION BY p.doc_id
               ORDER BY (p.tf * n.n_docs / d.df) DESC, p.w
             ) AS rank,
             round(p.tf * n.n_docs / d.df, 6) AS score
      FROM posting p JOIN dfreq d USING (w), n
    )
    SELECT doc_id, rank, w AS keyword, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, score
    FROM scored WHERE rank <= 3
    """,
)
def doc_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keyword extraction by rarity-weighted term
    frequency (score = tf·N/df — monotone in tf-idf with the portable
    exact rational replacing the engine-varying log; the per-doc
    summarization op a corpus browser/labeling UI runs).  One explode
    builds the (doc, term, tf) posting; document frequencies aggregate
    the posting itself (no second corpus pass); N broadcasts as a
    1-row aggregate; the top-3 filter is a per-doc rank window over the
    posting aggregate — every shuffle keyed on doc or term, nothing
    corpus-quadratic.  Scores are one double division of exact ints —
    bit-identical rank order cross-engine (w tiebreak)."""
    t = _t(spark, sf_dir)
    posting = (
        t["documents"]
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = posting.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = t["documents"].agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        posting.join(dfreq, on="w")
        .join(F.broadcast(n))
        .withColumn(
            "_s", F.col("tf") * F.col("n_docs") / F.col("df")
        )
    )
    wnd = Window.partitionBy("doc_id").orderBy(F.col("_s").desc(), "w")
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "rank",
            F.col("w").alias("keyword"),
            "tf",
            "df",
            F.round(F.col("_s"), 6).alias("score"),
        )
    )


@register(
    "funnel_time_bound",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), v AS (
      SELECT user_id, min(sec) AS v FROM e
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT v.user_id, min(e.sec) AS c
      FROM v JOIN e ON e.user_id = v.user_id
        AND e.event_type = 'click'
        AND e.sec > v.v AND e.sec <= v.v + 86400
      GROUP BY 1
    ), p AS (
      SELECT c.user_id, min(e.sec) AS p
      FROM c JOIN e ON e.user_id = c.user_id
        AND e.event_type = 'purchase'
        AND e.sec > c.c AND e.sec <= c.c + 86400
      GROUP BY 1
    )
    SELECT 'view' AS stage, CAST((SELECT count(*) FROM v) AS BIGINT)
             AS n_users
    UNION ALL
    SELECT 'click_24h', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'purchase_24h', CAST((SELECT count(*) FROM p) AS BIGINT)
    """,
)
def funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-bounded conversion funnel — first view → first click
    within 24h of it → first purchase within 24h of THAT click (the
    deadline variant of funnel_conversion: real attribution models
    expire, unbounded funnels overcount).  Each stage is one
    conditional-min aggregate keyed on user joined back with an equi
    key + range predicates (hash join with residual filter, never a
    nested loop); stage relations shrink monotonically, so at 100 TB
    the expensive side is only ever the first view scan."""
    t = _t(spark, sf_dir)
    e = t["events"].select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("sec"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("v"))
    )
    c = (
        v.join(
            e.filter(F.col("event_type") == "click").alias("e"),
            on=[
                v["user_id"] == F.col("e.user_id"),
                F.col("e.sec") > v["v"],
                F.col("e.sec") <= v["v"] + 86400,
            ],
        )
        .groupBy(v["user_id"].alias("user_id"))
        .agg(F.min("e.sec").alias("c"))
    )
    p = (
        c.join(
            e.filter(F.col("event_type") == "purchase").alias("e2"),
            on=[
                c["user_id"] == F.col("e2.user_id"),
                F.col("e2.sec") > c["c"],
                F.col("e2.sec") <= c["c"] + 86400,
            ],
        )
        .groupBy(c["user_id"].alias("user_id"))
        .agg(F.min("e2.sec").alias("p"))
    )
    out = (
        v.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit("view").alias("stage"), "n_users")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("click_24h").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("purchase_24h").alias("stage"), "n_users"
            )
        )
    )
    return out


# ---------------------------------------------------------------------------
# Skyline / robust statistics / linear interpolation (r8 fourth batch)
# ---------------------------------------------------------------------------

@register(
    "pareto_docs_frontier",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS distinct_tokens
      FROM documents
    ), pts AS (
      SELECT DISTINCT n_chars, distinct_tokens FROM d
    ), f AS (
      SELECT p.n_chars, p.distinct_tokens FROM pts p
      WHERE NOT EXISTS (
        SELECT 1 FROM d q
        WHERE q.n_chars >= p.n_chars
          AND q.distinct_tokens >= p.distinct_tokens
          AND (q.n_chars > p.n_chars
               OR q.distinct_tokens > p.distinct_tokens)
      )
    )
    SELECT min(d.doc_id) AS doc_id, f.n_chars, f.distinct_tokens
    FROM f JOIN d ON d.n_chars = f.n_chars
                 AND d.distinct_tokens = f.distinct_tokens
    GROUP BY f.n_chars, f.distinct_tokens
    """,
)
def pareto_docs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of the corpus (operators.sort.pareto_frontier_2d;
    Börzsönyi 2001 SKYLINE OF) — documents no other document beats on
    BOTH length and vocabulary richness, the multi-criteria data-
    selection primitive.  The oracle is the quadratic NOT-EXISTS
    dominance scan (fine at sf0.01, O(n²) at 100 TB); the Spark side
    is the exact sort-based decomposition — in (x DESC, y DESC) order
    a row survives iff y strictly exceeds the EXCLUSIVE running max —
    on the two-pass distributed running_max (one range exchange, never
    a one-task window).  A value match proves the decomposition IS the
    skyline."""
    from spark_monotasks_spark.operators.sort import pareto_frontier_2d

    t = _t(spark, sf_dir)
    d = t["documents"].select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("distinct_tokens"),
    )
    # distinct frontier representative = min doc_id per (x, y): feed
    # rows pre-reduced so the operator's tiebreak picks that exact row
    reduced = d.groupBy("n_chars", "distinct_tokens").agg(
        F.min("doc_id").alias("doc_id")
    )
    front = pareto_frontier_2d(
        reduced, "n_chars", "distinct_tokens", "doc_id"
    )
    return front.select("doc_id", "n_chars", "distinct_tokens")


@register(
    "mad_outlier_orders",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             o_orderkey AS id
      FROM orders
    ), r AS (
      SELECT priority, c,
             row_number() OVER (PARTITION BY priority ORDER BY c, id)
               AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM base
    ), m AS (
      SELECT priority, c, n,
             max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
                      THEN c END) OVER (PARTITION BY priority)
           + max(CASE WHEN rn = CAST(ceil((n + 1) / 2.0) AS BIGINT)
                      THEN c END) OVER (PARTITION BY priority) AS med2
      FROM r
    ), d AS (
      SELECT priority, n, med2, abs(2 * c - med2) AS dv FROM m
    ), dr AS (
      SELECT priority, n, med2, dv,
             row_number() OVER (PARTITION BY priority ORDER BY dv)
               AS drn
      FROM d
    ), md AS (
      SELECT priority, n, med2, dv,
             max(CASE WHEN drn = CAST(ceil(n / 2.0) AS BIGINT)
                      THEN dv END) OVER (PARTITION BY priority)
           + max(CASE WHEN drn = CAST(ceil((n + 1) / 2.0) AS BIGINT)
                      THEN dv END) OVER (PARTITION BY priority) AS mad2
      FROM dr
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(max(med2) AS BIGINT) AS med2,
           CAST(max(mad2) AS BIGINT) AS mad2,
           CAST(sum(CASE WHEN 2 * dv > 3 * mad2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM md GROUP BY priority
    """,
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per order priority
    (operators.profile.mad_outlier_screen) — the ROBUST complement of
    the Tukey-fence entry: MAD's 50% breakdown point survives
    contamination that drags quartiles.  Medians are exact rank-pair
    sums kept doubled (med2 = 2·median, mad2 = 4·MAD in int64) so the
    k=3 verdict 2·|2x−med2| > 3·mad2 never touches a float — the
    whole screen is engine-exact.  One Exchange on the group key
    serves both median passes and the final aggregate."""
    from spark_monotasks_spark.operators.profile import mad_outlier_screen

    t = _t(spark, sf_dir)
    out = mad_outlier_screen(
        t["orders"].select(
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
            "o_orderkey",
        ),
        "o_totalprice",
        ["priority"],
        "o_orderkey",
        k=3,
    )
    return out.select("priority", "n_rows", "med2", "mad2", "n_outliers")


@register(
    "timeseries_linterp",
    oracle="""
    WITH b AS (
      SELECT user_id AS key,
             (CAST(floor(epoch(ts)) AS BIGINT) // 21600) * 21600
               AS bucket_ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 100) AS BIGINT) AS val
      FROM events
    ), obs AS (
      SELECT key, bucket_ts, val AS obs_value FROM (
        SELECT key, bucket_ts, val,
               row_number() OVER (
                 PARTITION BY key, bucket_ts ORDER BY sec DESC, val DESC
               ) AS rn
        FROM b
      ) WHERE rn = 1
    ), span AS (
      SELECT key, min(bucket_ts) AS mn, max(bucket_ts) AS mx
      FROM b GROUP BY key
    ), grid AS (
      SELECT key,
             CAST(unnest(range(mn, mx + 21600, 21600)) AS BIGINT)
               AS bucket_ts
      FROM span
    ), g AS (
      SELECT grid.key, grid.bucket_ts, obs.obs_value
      FROM grid LEFT JOIN obs USING (key, bucket_ts)
    ), nbr AS (
      SELECT key, bucket_ts, obs_value,
             last_value(obs_value IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN obs_value IS NOT NULL
                             THEN bucket_ts END IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(obs_value IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN obs_value IS NOT NULL
                              THEN bucket_ts END IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM g
    )
    , vals AS (
      SELECT key, bucket_ts,
             CAST(CASE WHEN obs_value IS NOT NULL THEN obs_value
                  ELSE pv * (nt - bucket_ts) + nv * (bucket_ts - pt)
                  END AS BIGINT) AS val_num,
             CAST(CASE WHEN obs_value IS NOT NULL THEN 1
                  ELSE nt - pt END AS BIGINT) AS val_den,
             obs_value IS NULL AS interpolated
      FROM nbr
    )
    SELECT key, bucket_ts, val_num, val_den,
           (val_num * 200 + val_den) // (2 * val_den) AS value_e4,
           interpolated
    FROM vals
    """,
)
def timeseries_linterp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling (operators.timeseries.
    resample_linterp — the other half of timeseries_gapfill's
    forward-fill): per user, a 6-hour grid where gap points take the
    exact line between surrounding observations.  Integer cents ×
    integer bucket seconds keep the interpolant an exact int64
    rational (num = v0·(t1−t) + v1·(t−t0), den = t1−t0), and the
    display value ships as int64 ten-thousandths via half-up INTEGER
    division — the rounded-double form hit a real decimal-tie
    divergence (Spark BigDecimal HALF_UP on the shortest decimal repr
    vs DuckDB rounding the raw binary) at sf0.01.  Grid generation is
    sequence()-per-key (no calendar cross join); both neighbor windows
    share the key partitioning."""
    from spark_monotasks_spark.operators.timeseries import resample_linterp

    t = _t(spark, sf_dir)
    out = resample_linterp(
        t["events"], "user_id", "ts", "value", step_seconds=21600
    )
    return out.select(
        "key", "bucket_ts", "val_num", "val_den", "value_e4", "interpolated"
    )


# ---------------------------------------------------------------------------
# Hierarchy rollup / integrity audit / token association (r8 fifth batch)
# ---------------------------------------------------------------------------

@register(
    "hierarchy_subtree_rollup",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT doc_id AS child, (doc_id - 1) // 3 AS parent
      FROM documents WHERE doc_id >= 1
    ), anc AS (
      SELECT child AS node, parent AS anc, 1 AS dist FROM edges
      UNION ALL
      SELECT a.node, e.parent, a.dist + 1
      FROM anc a JOIN edges e ON a.anc = e.child
    ), vals AS (
      SELECT doc_id AS node, n_chars AS v FROM documents
    ), depth AS (
      SELECT node, count(*) AS depth FROM anc GROUP BY node
    ), contrib AS (
      SELECT anc, count(*) AS n_desc, sum(v) AS ds
      FROM anc JOIN vals USING (node) GROUP BY anc
    )
    SELECT v.node AS doc_id,
           CAST(coalesce(d.depth, 0) AS BIGINT) AS depth,
           CAST(coalesce(c.n_desc, 0) AS BIGINT) AS n_desc,
           CAST(coalesce(c.ds, 0) + v.v AS BIGINT) AS subtree_value
    FROM vals v
    LEFT JOIN depth d ON d.node = v.node
    LEFT JOIN contrib c ON c.anc = v.node
    """,
)
def hierarchy_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over a hierarchy by ITERATIVE DOUBLING
    (graph/hierarchy.subtree_rollup) — the org-chart / BOM /
    category-tree aggregate: every node's depth, descendant count, and
    subtree character total.  The hierarchy is PLANTED (ternary tree:
    parent = (doc_id−1)//3) so the oracle can state it, and the oracle
    closes it with the textbook one-hop-per-step recursive CTE while
    Spark doubles — closure_{2k} = closure_k ∘ closure_k — reaching
    depth d in ⌈log₂ d⌉ self-joins instead of d sequential supersteps
    (reference: graphx Pregel.scala iterates one hop per superstep).
    A value match proves the doubling closure computes exactly the
    recursive closure.  Working set O(nodes × depth); each round one
    equi-join, lineage barriered per round."""
    from spark_monotasks_spark.graph.hierarchy import subtree_rollup

    t = _t(spark, sf_dir)
    docs = t["documents"]
    parents = docs.filter(F.col("doc_id") >= 1).select(
        F.col("doc_id").alias("child"),
        ((F.col("doc_id") - 1) / 3).cast("long").alias("parent"),
    )
    return subtree_rollup(
        parents, docs, "doc_id", "n_chars", max_depth=16
    )


@register(
    "fk_integrity_audit",
    oracle="""
    WITH live_cust AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 != 0
    ), r1 AS (
      SELECT 'orders.o_custkey->customer' AS relationship,
             CAST(count(*) AS BIGINT) AS n_child,
             CAST(sum(CASE WHEN lc.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM orders o LEFT JOIN live_cust lc ON o.o_custkey = lc.c_custkey
    ), r2 AS (
      SELECT 'lineitem.l_orderkey->orders' AS relationship,
             CAST(count(*) AS BIGINT) AS n_child,
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT relationship, n_child, n_orphans,
           round(n_orphans / n_child, 6) AS orphan_frac
    FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphan foreign keys per
    relationship, the warehouse data-quality check beside the
    constraint profiler (data_profile_constraints): every child row is
    left-joined to its parent key set and counted.  One relationship
    is PLANTED broken (customers with key ≡ 0 mod 97 simulated as
    deleted) so the audit demonstrably fires; lineitem→orders audits
    the real intact key.  Parent key sets project to the key column
    only (broadcast-sized dims at any fact scale); orphan counting is
    a conditional sum in the same pass as the join."""
    t = _t(spark, sf_dir)
    live_cust = (
        t["customer"]
        .filter(F.col("c_custkey") % 97 != 0)
        .select("c_custkey")
    )
    r1 = (
        t["orders"]
        .join(
            F.broadcast(live_cust),
            t["orders"]["o_custkey"] == live_cust["c_custkey"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        .select(
            F.lit("orders.o_custkey->customer").alias("relationship"),
            "n_child",
            "n_orphans",
        )
    )
    okeys = t["orders"].select("o_orderkey")
    r2 = (
        t["lineitem"]
        .join(
            okeys,
            t["lineitem"]["l_orderkey"] == okeys["o_orderkey"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        .select(
            F.lit("lineitem.l_orderkey->orders").alias("relationship"),
            "n_child",
            "n_orphans",
        )
    )
    return r1.unionByName(r2).select(
        "relationship",
        "n_child",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_child"), 6).alias(
            "orphan_frac"
        ),
    )


@register(
    "token_lift_pairs",
    oracle="""
    WITH dtok AS (
      SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' ')))
               AS w
      FROM documents
    ), dfreq AS (
      SELECT w, count(*) AS df FROM dtok GROUP BY w
    ), top AS (
      SELECT w, df FROM dfreq ORDER BY df DESC, w LIMIT 50
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), pairs AS (
      SELECT a.w AS w_a, b.w AS w_b, count(*) AS n_ab
      FROM (SELECT doc_id, w FROM dtok JOIN top USING (w)) a
      JOIN (SELECT doc_id, w FROM dtok JOIN top USING (w)) b
        ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
    )
    SELECT w_a, w_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(n_ab * n_docs / (ta.df * tb.df), 6) AS lift
    FROM pairs JOIN top ta ON ta.w = w_a
               JOIN top tb ON tb.w = w_b, n
    ORDER BY round(n_ab * n_docs / (ta.df * tb.df), 6) DESC, w_a, w_b
    LIMIT 30
    """,
)
def token_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token association mining by LIFT — n_ab·N / (n_a·n_b), the
    log-free exact-rational core of PMI (log is engine-varying; lift
    ranks identically) — over document-level co-occurrence of the top
    50 tokens: the collocation/phrase-mining signal beside the
    sequential transition matrix.  Blocking makes it scale: only the
    top-k tokens by document frequency (one TakeOrdered, broadcast)
    enter the per-doc pair join, so pair volume is ≤ C(k,2) per doc
    regardless of vocabulary size.  Top-30 by rounded lift with full
    tiebreaks."""
    t = _t(spark, sf_dir)
    dtok = t["documents"].select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    )
    dfreq = dtok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), "w").limit(50)
    n = t["documents"].agg(F.count(F.lit(1)).alias("n_docs"))
    pruned = dtok.join(F.broadcast(top), on="w")
    a = pruned.select(F.col("doc_id"), F.col("w").alias("w_a"))
    b = pruned.select(F.col("doc_id").alias("doc_id_b"),
                      F.col("w").alias("w_b"))
    pairs = (
        a.join(
            b,
            on=[
                a["doc_id"] == b["doc_id_b"],
                F.col("w_a") < F.col("w_b"),
            ],
        )
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = top.select(F.col("w").alias("w_a"), F.col("df").alias("_dfa"))
    tb = top.select(F.col("w").alias("w_b"), F.col("df").alias("_dfb"))
    lift = F.col("n_ab") * F.col("n_docs") / (F.col("_dfa") * F.col("_dfb"))
    return (
        pairs.join(F.broadcast(ta), on="w_a")
        .join(F.broadcast(tb), on="w_b")
        .join(F.broadcast(n))
        .select(
            "w_a", "w_b", "n_ab", F.round(lift, 6).alias("lift")
        )
        .orderBy(F.col("lift").desc(), "w_a", "w_b")
        .limit(30)
    )
