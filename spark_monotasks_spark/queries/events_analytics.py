"""Event-analytics catalog entries: funnel conversion and cohort
retention over the events table.

Beyond-reference composites (the reference's BigDataBenchmark queries
stop at scan/agg/join — SURVEY §6): these are the two shapes every
product-analytics workload runs at scale, expressed entirely in
joins + aggregates so Catalyst plans them with ordinary shuffles on
user_id.  Both carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, the first
    view, the first click strictly after it, the first purchase
    strictly after that; output counts users surviving each stage.

    Scale shape: three per-user min-aggregations + two joins, ALL keyed
    on user_id — one partitioning reused across every stage, no
    self-join explosion (each stage's right side is one row per
    surviving user)."""
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.join(v, on="user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.join(c, on="user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@register(
    "cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
             CAST((CAST(floor(epoch(e.ts)) AS BIGINT)
                   - CAST(floor(epoch(f.first_ts)) AS BIGINT)) // 604800
                  AS INT) AS week_offset
      FROM events e JOIN f USING (user_id)
    )
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset,
           count(*) AS n_users
    FROM act GROUP BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the ISO week of their
    first event; for each cohort, how many were active 0,1,2,… weeks
    later (offset measured from each user's own first event, so the
    matrix is calendar-alignment-free).

    Scale shape: one user_id aggregation for first-seen, one broadcast-
    able (users ≪ events) join back, one distinct + count — the
    retention matrix is tiny (weeks × offsets) however large the event
    log."""
    e = _events(spark, sf_dir)
    f = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    sec = lambda col: F.col(col).cast("timestamp").cast("long")  # noqa: E731
    act = (
        e.join(f, on="user_id")
        .select(
            "user_id",
            F.date_trunc("week", "first_ts").cast("date").cast("string")
            .alias("cohort_week"),
            F.floor((sec("ts") - sec("first_ts")) / 604800)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "timeseries_gapfill",
    oracle="""
    WITH b AS (
      SELECT user_id,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      FROM events WHERE user_id < 40
    ), obs AS (
      SELECT user_id, bucket_ts, value AS obs_value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, bucket_ts ORDER BY sec DESC, value DESC
        ) AS rn FROM b
      ) WHERE rn = 1
    ), span AS (
      SELECT user_id, min(bucket_ts) AS mn, max(bucket_ts) AS mx
      FROM b GROUP BY user_id
    ), grid AS (
      SELECT user_id, mn + i * 3600 AS bucket_ts
      FROM span, UNNEST(range(0, (mx - mn) // 3600 + 1)) AS t(i)
    )
    SELECT g.user_id AS key, g.bucket_ts,
           last_value(o.obs_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value,
           o.obs_value IS NULL AS filled
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.bucket_ts = g.bucket_ts
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators.timeseries.resample_ffill):
    per-user hourly grid from first to last event, last-write-wins
    bucket values, forward-filled gaps — the feature-engineering
    resample vanilla SQL lacks, value-audited against an oracle that
    rebuilds the same grid with generate-series + IGNORE NULLS
    last_value."""
    from spark_monotasks_spark.operators.timeseries import resample_ffill

    e = _events(spark, sf_dir).filter(F.col("user_id") < 40)
    return resample_ffill(e, "user_id", "ts", "value", step_seconds=3600)


@register(
    "session_window_sql",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             epoch(ts) AS raw FROM events WHERE user_id < 30
    ), marked AS (
      SELECT user_id, sec, raw,
             CASE WHEN raw - lag(raw) OVER (PARTITION BY user_id ORDER BY raw)
                       > 1800 OR
                  lag(raw) OVER (PARTITION BY user_id ORDER BY raw) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), grouped AS (
      SELECT user_id, sec, raw,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY raw
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM marked
    )
    SELECT user_id, min(sec) AS session_start,
           max(sec) + 1800 AS session_end, count(*) AS n_events
    FROM grouped GROUP BY user_id, sid
    """,
)
def session_window_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-minute gap) checked
    against FIRST PRINCIPLES: the oracle rebuilds the same sessions with
    the classic gaps-and-islands SQL (lag → new-session flag → running
    sum → group), so Spark's built-in session assignment — including
    the end = last event + gap convention — is value-audited, not just
    trusted.  Batch form of the streaming session_windowed_agg."""
    e = _events(spark, sf_dir).filter(F.col("user_id") < 30)
    sw = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count("*").alias("n_events"))
    sec = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    return sw.select(
        "user_id",
        sec("session_window.start").alias("session_start"),
        sec("session_window.end").alias("session_end"),
        "n_events",
    )


@register(
    "window_sliding_counts",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
    ), assigned AS (
      SELECT (sec // 3600) * 3600 AS w1, ((sec // 3600) - 1) * 3600 AS w2
      FROM e
    ), melted AS (
      SELECT w1 AS window_start FROM assigned
      UNION ALL
      SELECT w2 FROM assigned
    )
    SELECT window_start, count(*) AS n FROM melted GROUP BY window_start
    """,
)
def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (F.window with slide < length: 2-hour
    windows every hour — each event lands in exactly two).  The oracle
    assigns both containing windows arithmetically, proving Spark's
    window expansion semantics."""
    e = _events(spark, sf_dir)
    w = e.groupBy(F.window("ts", "2 hours", "1 hour")).agg(
        F.count("*").alias("n")
    )
    return w.select(
        F.col("window.start").cast("timestamp").cast("long")
        .alias("window_start"),
        "n",
    )
