"""Time-series regularization: resample an irregular event stream onto
a fixed grid with forward-fill — the gap-filling operator every
monitoring / feature-engineering pipeline needs and vanilla SQL lacks.

Scale shape (per key): the grid is `sequence()`-generated and exploded
— O(span/step) rows per key, never a cross join against a calendar
table; bucket aggregation and the forward-fill window both run on the
same key partitioning, so the whole operator costs one shuffle on
(key, bucket) plus one on key.  At 100 TB the output is bounded by
keys × buckets regardless of input event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per key: bucket observations to ``step_seconds``, build the full
    dense grid from the key's first to last bucket, and forward-fill
    buckets with no observation from the latest earlier value.

    Bucket value = the observation with the greatest (ts, tiebreak
    row order) in the bucket — "last write wins", deterministically.
    Output: (key, bucket_ts epoch-seconds, value, filled flag).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    step = int(step_seconds)
    bucketed = df.select(
        F.col(key_col).alias("key"),
        ((sec / step).cast("long") * step).alias("bucket_ts"),
        sec.alias("_sec"),
        F.col(value_col).alias("_val"),
    )
    w_last = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("_sec").desc(), F.col("_val").desc()
    )
    obs = (
        bucketed.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket_ts", F.col("_val").alias("obs_value"))
    )
    span = bucketed.groupBy("key").agg(
        F.min("bucket_ts").alias("_mn"), F.max("bucket_ts").alias("_mx")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step))
        ).alias("bucket_ts"),
    )
    joined = grid.join(obs, on=["key", "bucket_ts"], how="left")
    w_fill = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "key",
        "bucket_ts",
        F.last("obs_value", ignorenulls=True).over(w_fill).alias("value"),
        F.col("obs_value").isNull().alias("filled"),
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    bucket: str = "1 hour",
) -> DataFrame:
    """OHLC downsampling (the financial/metrics resampling staple):
    per key and time bucket — open (value at the earliest row), high,
    low, close (value at the latest row), n.

    Determinism: ties on the timestamp are broken by the value itself
    (rank on ``(ts, value)`` asc for open, desc for close), so the
    result is a pure function of the row SET — engine-reproducible,
    unlike bare first/last over an arbitrary partition order.

    Scale shape: ONE Exchange on (keys, bucket) serves both rank
    windows and the final aggregate (Catalyst reuses the
    partitioning); high/low/n fold into the same grouped pass."""
    b = F.window(F.col(ts_col), bucket).getField("start").alias("bucket")
    base = df.select(*keys, F.col(ts_col).alias("_ts"),
                     F.col(value_col).cast("double").alias("_v"), b)
    w_a = Window.partitionBy(*keys, "bucket").orderBy("_ts", "_v")
    w_d = Window.partitionBy(*keys, "bucket").orderBy(
        F.col("_ts").desc(), F.col("_v").desc()
    )
    ranked = base.select(
        *keys,
        "bucket",
        "_v",
        F.row_number().over(w_a).alias("_ra"),
        F.row_number().over(w_d).alias("_rd"),
    )
    return ranked.groupBy(*keys, "bucket").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("_v"))).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col("_v"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def sliding_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """EXACT trailing-``window_days`` distinct keys per day WITHOUT the
    quadratic re-scan (beyond-reference growth analytics — the rolling
    complement of the cumulative_unique_users decomposition).

    The naive form — for every day, COUNT(DISTINCT key) over a self-
    joined trailing window — re-reads each event ``window_days`` times
    and re-deduplicates per day: O(days x window) scans at 100 TB.
    This operator is linear via the first-event-in-window decomposition:
    a key contributes to the window ending at day *e* iff it has an
    event day *d* in [e-w+1, e] AND that *d* is its FIRST event day in
    the range, i.e. its previous event day is < e-w+1.  So each
    distinct (key, day) pair — with its per-key lag — expands into AT
    MOST ``window_days`` (day, offset) contributions, each checked
    against the lag locally: one shuffle to dedup (key, day), one
    per-key window for the lag, one bounded explode, one count.

    Output: (day, n_keys) for every day in the data's [min, max] span
    that has at least one contributing key.  Rows are DATE-typed.
    """
    w = int(window_days)
    kd = (
        df.select(
            F.col(key_col).alias("_k"),
            F.to_date(F.col(ts_col)).alias("_d"),
        )
        .distinct()
    )
    lagw = Window.partitionBy("_k").orderBy("_d")
    with_prev = kd.select(
        "_k", "_d", F.lag("_d").over(lagw).alias("_prev")
    )
    bounds = kd.agg(F.max("_d").alias("_mx"))
    contrib = (
        with_prev.select(
            "_k",
            "_prev",
            F.explode(
                F.expr(f"transform(sequence(0, {w - 1}), o -> date_add(_d, o))")
            ).alias("day"),
        )
        .join(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("_mx"))
        .filter(
            F.col("_prev").isNull()
            | (F.col("_prev") < F.date_sub(F.col("day"), w - 1))
        )
    )
    return contrib.groupBy("day").agg(F.count(F.lit(1)).alias("n_keys"))


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    taps: int = 8,
) -> DataFrame:
    """Per-key EWMA smoothing with a DYADIC finite kernel — weights
    2^(taps-1-j) over the last ``taps`` observations (alpha = 1/2),
    exactly the repo's dyadic playbook: scaling values to integer cents
    and using power-of-two weights keeps the numerator and denominator
    in EXACT int64 arithmetic, so an external engine reproduces the
    smoothed series bit-for-bit (a true infinite-horizon EWMA is a
    float recurrence whose summation order no two engines share).

    Scale shape: one hash exchange on the key serves the single
    bounded-frame window; the kernel is ``taps`` lag expressions folded
    JVM-side — no Python, no second shuffle, output rows = input rows.

    Output: key, tiebreak, cents, ewma_num (int), ewma_den (int),
    ewma = round(num/den/100, 4).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(order_tiebreak).alias("tiebreak"),
        cents.alias("cents"),
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(taps):
        weight = 1 << (taps - 1 - j)
        lagv = F.lag("cents", j).over(
            Window.partitionBy("key").orderBy("_ts", "tiebreak")
        )
        num = num + F.coalesce(lagv * weight, F.lit(0))
        den = den + F.when(lagv.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return base.select(
        "key",
        "tiebreak",
        "cents",
        num.alias("ewma_num"),
        den.alias("ewma_den"),
        F.round(num / den / 100.0, 4).alias("ewma"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-key TIME-weighted average (TWAP): each observation's value
    is held until the key's next observation and weighted by that
    holding duration in whole seconds.  The key's last observation has
    no successor and contributes nothing (standard left-closed TWAP).

    Exactness: values scale to integer cents and durations are integer
    seconds, so numerator/denominator are exact int64 — engine-
    reproducible (the usual double x double accumulation is not).

    Scale shape: one exchange on the key for the lead window, then the
    grouped sum on the SAME partitioning (no second exchange); output
    is one row per key with >= 2 observations.

    Output: key, twap_num, twap_den, twap = round(num/den/100, 4).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    staged = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(order_tiebreak).alias("_tb"),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
        sec.alias("_sec"),
    ).withColumn("_dur", F.lead("_sec").over(
        Window.partitionBy("key").orderBy("_ts", "_tb")
    ) - F.col("_sec"))
    held = staged.filter(F.col("_dur").isNotNull())
    return held.groupBy("key").agg(
        F.sum(F.col("_cents") * F.col("_dur")).alias("twap_num"),
        F.sum("_dur").alias("twap_den"),
        F.round(
            F.sum(F.col("_cents") * F.col("_dur"))
            / F.sum("_dur")
            / 100.0,
            4,
        ).alias("twap"),
    )


def cusum_detect(
    daily: DataFrame,
    order_col: str,
    value_col: str,
    scale,
    target_num,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One-sided CUSUM change detection over a BOUNDED pre-aggregated
    series (Page 1954).  The textbook recurrence S_t = max(0, S_{t-1} +
    (x_t - k)) is not a window function, but its closed form is:
    S_t = P_t - min(0, min_{i<=t} P_i) where P is the prefix sum of
    the drift-adjusted series — two cumulative windows, no recursion.

    Exactness: the caller passes the allowance as an exact rational
    (``target_num / scale``, ints or int-typed Columns — Columns let a
    cross-joined 1-row totals frame supply them with NO driver-side
    scalar fetch); each value is multiplied through by ``scale`` so the
    adjusted series y_t = scale*x_t - target_num stays pure int64 —
    both engines agree bit-for-bit.

    Boundedness contract (plan-gate): ``daily`` MUST be an already-
    collapsed aggregate (e.g. one row per day) — the un-partitioned
    cumulative windows here are the legitimate bounded-input case the
    catalog-wide gate in tests/test_plans.py carves out, exactly like
    zip_with_index's offset window.  Never hand this a raw scan.

    Output: order_col, value_col, *keep_cols, cusum (scaled int64).
    """
    scale_c = F.lit(scale) if isinstance(scale, int) else scale
    target_c = (
        F.lit(target_num) if isinstance(target_num, int) else target_num
    )
    y = (
        F.col(value_col).cast("long") * scale_c.cast("long")
        - target_c.cast("long")
    )
    wp = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    staged = daily.select(
        F.col(order_col),
        F.col(value_col),
        *[F.col(c) for c in keep_cols],
        F.sum(y).over(wp).alias("_p"),
    )
    return staged.select(
        order_col,
        value_col,
        *keep_cols,
        (
            F.col("_p")
            - F.least(F.lit(0).cast("long"), F.min("_p").over(wp))
        ).alias("cusum"),
    )


def debounce(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    min_gap_seconds: int,
) -> DataFrame:
    """Debounce an event stream — the telemetry/clickstream noise
    filter (double-clicks, sensor chatter) every event pipeline runs
    before sessionization.

    Semantics: WINDOWED debounce — per (key, tumbling window of
    ``min_gap_seconds``), keep the earliest event (deterministic
    tiebreak).  The strict anchored form ("keep iff >= gap since the
    last KEPT event") is an inherently sequential recurrence — each
    decision depends on the previous one — with no bounded-window
    decomposition; the tumbling form is the standard scale
    approximation (metrics pre-aggregation systems ship exactly this)
    with crisp guarantees: a burst narrower than ``min_gap_seconds``
    contributes at most 2 survivors (window straddle), and survivors
    within a window are unique.  One shuffle on (key, window), one
    rank filter, engine-reproducible.

    Output: the surviving rows of ``df`` (all original columns).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    bucket = (sec / min_gap_seconds).cast("long")
    w = Window.partitionBy(key_col, bucket).orderBy(ts_col, order_tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def rate_limit(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    window_seconds: int,
    max_per_window: int,
) -> DataFrame:
    """Throttle an event stream: per key and tumbling window, keep at
    most ``max_per_window`` earliest events (deterministic tiebreak) —
    the ingestion-side fairness cap that stops one hot key from
    flooding a 100 TB event pipeline.  One shuffle on (key, window);
    the rank filter is Catalyst's LimitPushDownThroughWindow shape
    (bounded before the window output materializes)."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    bucket = (sec / window_seconds).cast("long")
    w = Window.partitionBy(key_col, bucket).orderBy(ts_col, order_tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_window)
        .drop("_rn")
    )


def resample_linterp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-key resampling with LINEAR interpolation — the other half of
    :func:`resample_ffill`: gaps take the line between the surrounding
    observations instead of holding the last value (sensor/metric
    series where the quantity moves between samples).

    Exact rational form: observation values scale to integer cents and
    grid times are integer bucket seconds, so the interpolated value at
    grid point t between observations (t0, v0) and (t1, v1) is the
    exact int64 pair ``num = v0·(t1−t) + v1·(t−t0)``, ``den = t1−t0``.
    Observation buckets return the observation exactly (num=v, den=1).
    The display value ships as INTEGER ten-thousandths via int64
    half-up division — a rounded double here is a portability trap:
    the quotient can land exactly on a decimal .XXXX5 tie, where
    Spark's ROUND (BigDecimal HALF_UP on the shortest decimal repr)
    and DuckDB's round (on the raw binary value) disagree by 1 ulp of
    the last digit.  Integer division has no such tie ambiguity.

    Scale shape: identical to resample_ffill — the dense grid is
    sequence()-generated per key (never a calendar cross join), and the
    backward/forward neighbor windows share the key partitioning.
    Output is keys × buckets regardless of input event count.

    Output: (key, bucket_ts, val_num, val_den, value_e4, interpolated)
    — value_e4 = round-half-up(num/den/100 · 10⁴) as int64.
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    step = int(step_seconds)
    cents = F.round(F.col(value_col) * 100).cast("long")
    bucketed = df.select(
        F.col(key_col).alias("key"),
        ((sec / step).cast("long") * step).alias("bucket_ts"),
        sec.alias("_sec"),
        cents.alias("_val"),
    )
    w_last = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("_sec").desc(), F.col("_val").desc()
    )
    obs = (
        bucketed.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket_ts", F.col("_val").alias("obs_value"))
    )
    span = bucketed.groupBy("key").agg(
        F.min("bucket_ts").alias("_mn"), F.max("bucket_ts").alias("_mx")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step))
        ).alias("bucket_ts"),
    )
    joined = grid.join(obs, on=["key", "bucket_ts"], how="left")
    w_back = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("obs_value").isNotNull(), F.col("bucket_ts"))
    staged = joined.select(
        "key",
        "bucket_ts",
        "obs_value",
        F.last("obs_value", ignorenulls=True).over(w_back).alias("_pv"),
        F.last(obs_t, ignorenulls=True).over(w_back).alias("_pt"),
        F.first("obs_value", ignorenulls=True).over(w_fwd).alias("_nv"),
        F.first(obs_t, ignorenulls=True).over(w_fwd).alias("_nt"),
    )
    num = F.when(
        F.col("obs_value").isNotNull(), F.col("obs_value")
    ).otherwise(
        F.col("_pv") * (F.col("_nt") - F.col("bucket_ts"))
        + F.col("_nv") * (F.col("bucket_ts") - F.col("_pt"))
    )
    den = F.when(F.col("obs_value").isNotNull(), F.lit(1).cast("long")).otherwise(
        F.col("_nt") - F.col("_pt")
    )
    staged = staged.select(
        "key",
        "bucket_ts",
        num.alias("val_num"),
        den.alias("val_den"),
        F.col("obs_value").isNull().alias("interpolated"),
    )
    # value_e4 = half-up(num / (den*100) * 1e4) in pure int64:
    # (num*200 + den) div (2*den) — no float, no decimal-tie ambiguity
    return staged.select(
        "key",
        "bucket_ts",
        "val_num",
        "val_den",
        F.expr(
            "(val_num * 200 + val_den) div (2 * val_den)"
        ).alias("value_e4"),
        "interpolated",
    )
