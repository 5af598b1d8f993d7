"""Property tests for the r8 analytics operators: each distributed
decomposition is replayed by an independent pure-Python oracle on
synthetic frames (the DuckDB parity sweep in test_oracle_parity.py
covers the catalog entries; these tests pin the OPERATOR semantics on
adversarial shapes — gaps, ties, singletons — the table data may not
exercise)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from pyspark.sql import functions as F


def _mkts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, 0) + dt.timedelta(seconds=sec)


def test_sliding_distinct_equals_bruteforce(spark):
    """Linear first-event-in-window decomposition == quadratic rescan,
    on a shape with gaps (days with no events), repeat visitors, and a
    user active every day."""
    from spark_monotasks_spark.operators.timeseries import sliding_distinct

    rows = []
    # user 1: every day 1..20; user 2: days 1, 9, 10 (re-enters after
    # falling out of the window); user 3: single day 5; user 4: days
    # 15 and 16 only; two events same user+day must dedup
    for d in range(1, 21):
        rows.append((1, _mkts(d)))
    for d in (1, 9, 10):
        rows.append((2, _mkts(d)))
        rows.append((2, _mkts(d, 60)))
    rows.append((3, _mkts(5)))
    for d in (15, 16):
        rows.append((4, _mkts(d)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    got = {
        r["day"]: r["n_keys"]
        for r in sliding_distinct(df, "user_id", "ts", 7).collect()
    }

    days = defaultdict(set)
    for u, ts in rows:
        days[ts.date()].add(u)
    all_days = sorted(days)
    for d in all_days:
        expect = set()
        for back in range(7):
            expect |= days.get(d - dt.timedelta(days=back), set())
        assert got[d] == len(expect), (d, got[d], expect)
    # no spurious window-end days beyond the data's max day
    assert max(got) == max(all_days)


def test_sliding_distinct_window_one_is_daily_distinct(spark):
    from spark_monotasks_spark.operators.timeseries import sliding_distinct

    rows = [(1, _mkts(1)), (2, _mkts(1)), (1, _mkts(3))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: r["n_keys"]
        for r in sliding_distinct(df, "user_id", "ts", 1).collect()
    }
    assert got == {dt.date(2024, 1, 1): 2, dt.date(2024, 1, 3): 1}


def test_cusum_detect_matches_recurrence(spark):
    """Closed prefix-sum form == the textbook max(0, S + y) recurrence,
    including a regime shift that must push the statistic up."""
    from spark_monotasks_spark.operators.timeseries import cusum_detect

    values = [5, 6, 4, 5, 5, 12, 13, 11, 12, 3, 2, 5]
    daily = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "t long, x long"
    )
    # allowance = exact mean as a rational: scale=len, target=sum
    n, tot = len(values), sum(values)
    out = {
        r["t"]: r["cusum"]
        for r in cusum_detect(daily, "t", "x", scale=n, target_num=tot).collect()
    }
    s = 0
    for i, v in enumerate(values):
        s = max(0, s + n * v - tot)
        assert out[i] == s, (i, out[i], s)
    # the shifted segment must actually raise an alarm-worthy excursion
    assert max(out.values()) > 0


def test_ewma_dyadic_matches_python_replay(spark):
    from spark_monotasks_spark.operators.timeseries import ewma_dyadic

    rows = [
        (1, _mkts(1, i), i, float(v))
        for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 5.5, 1.25])
    ] + [(2, _mkts(1), 99, 7.77)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, v double")
    got = {
        (r["key"], r["tiebreak"]): (r["ewma_num"], r["ewma_den"], r["ewma"])
        for r in ewma_dyadic(df, "k", "ts", "v", "eid", taps=4).collect()
    }
    series = defaultdict(list)
    for k, ts, eid, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        series[k].append((eid, round(v * 100)))
    for k, obs in series.items():
        for i, (eid, _) in enumerate(obs):
            num = den = 0
            for j in range(4):
                if i - j < 0:
                    break
                w = 1 << (3 - j)
                num += obs[i - j][1] * w
                den += w
            expect = (num, den, round(num / den / 100.0, 4))
            assert got[(k, eid)] == expect, (k, eid, got[(k, eid)], expect)


def test_time_weighted_avg_matches_python_replay(spark):
    from spark_monotasks_spark.operators.timeseries import time_weighted_avg

    rows = [
        (1, _mkts(1, 0), 1, 10.0),   # held 30s
        (1, _mkts(1, 30), 2, 20.0),  # held 70s
        (1, _mkts(1, 100), 3, 99.0),  # last: excluded
        (2, _mkts(1, 0), 4, 5.0),    # singleton user: dropped entirely
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, v double")
    got = {
        r["key"]: (r["twap_num"], r["twap_den"], r["twap"])
        for r in time_weighted_avg(df, "k", "ts", "v", "eid").collect()
    }
    num = 1000 * 30 + 2000 * 70
    den = 100
    assert got == {1: (num, den, round(num / den / 100.0, 4))}


def test_rrf_fuse_matches_python_replay(spark):
    from spark_monotasks_spark.pipeline.similarity import rrf_fuse

    ra = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    rb = spark.createDataFrame(
        [(12, 1), (13, 2)], "doc_id long, rank long"
    )
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([ra, rb], "doc_id", k=60).collect()
    }
    expect = {
        10: round(1.0 / 61, 6),
        11: round(1.0 / 62, 6),
        12: round(1.0 / 63 + 1.0 / 61, 6),
        13: round(1.0 / 62, 6),
    }
    assert got == expect


def test_cusum_keeps_extra_columns_and_is_nonnegative(spark):
    from spark_monotasks_spark.operators.timeseries import cusum_detect

    daily = spark.createDataFrame(
        [(0, 1, 7), (1, 100, 7), (2, 1, 7)], "t long, x long, extra long"
    )
    out = cusum_detect(
        daily, "t", "x", scale=3, target_num=102, keep_cols=("extra",)
    )
    rows = out.collect()
    assert set(out.columns) == {"t", "x", "extra", "cusum"}
    assert all(r["cusum"] >= 0 for r in rows)
    assert all(r["extra"] == 7 for r in rows)


def test_debounce_burst_guarantee(spark):
    """A burst narrower than the gap yields at most 2 survivors; widely
    spaced events all survive; survivors are the window-earliest."""
    from spark_monotasks_spark.operators.timeseries import debounce

    rows = (
        # burst: 5 events within 60s (gap 600) — at most 2 survive
        [(1, _mkts(1, 100 + i), i, "x") for i in range(5)]
        # spaced: every 2000s — all survive
        + [(2, _mkts(1, i * 2000), 100 + i, "x") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, v string")
    kept = debounce(df, "k", "ts", "eid", min_gap_seconds=600).collect()
    by_key = defaultdict(list)
    for r in kept:
        by_key[r["k"]].append(r["eid"])
    assert len(by_key[1]) <= 2 and 0 in by_key[1]
    assert sorted(by_key[2]) == [100, 101, 102, 103]


def test_rate_limit_cap_and_order(spark):
    from spark_monotasks_spark.operators.timeseries import rate_limit

    rows = [(1, _mkts(1, i), i, "x") for i in range(10)]  # one window
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, v string")
    kept = rate_limit(df, "k", "ts", "eid", window_seconds=3600,
                      max_per_window=3).collect()
    assert sorted(r["eid"] for r in kept) == [0, 1, 2]


def test_kcenter_matches_python_greedy(spark):
    """Distributed farthest-point traversal == the serial greedy on a
    planted 2-D layout with an unambiguous selection order."""
    from spark_monotasks_spark.pipeline.similarity import kcenter_select

    pts = {10: [0.0, 0.0], 11: [0.25, 0.0], 12: [8.0, 0.0],
           13: [0.0, 6.0], 14: [8.0, 6.0], 15: [4.0, 3.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<float>"
    )
    got = {r["sel_round"]: (r["vec_id"], r["radius"])
           for r in kcenter_select(df, k=4).collect()}

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    sel = [min(pts)]  # seed = min id
    radii = {0: 0.0}
    for r in range(1, 4):
        best = max(
            ((min(sq(pts[i], pts[c]) for c in sel), -i), i)
            for i in pts if i not in sel
        )
        # max by (distance, -id) implements the min-id tiebreak
        d, i = best[0][0], best[1]
        sel.append(i)
        radii[r] = round(d, 4)
    for r in range(4):
        assert got[r] == (sel[r], radii[r]), (r, got[r], (sel[r], radii[r]))


def test_kcenter_covers_all_points_within_last_radius(spark):
    """k-center invariant: after k rounds every point's distance to the
    selected set is <= the last chosen radius (greedy monotonicity)."""
    from spark_monotasks_spark.pipeline.similarity import kcenter_select
    from spark_monotasks_spark.tables import load_tables
    from tests.conftest import SF_TEST_DIR

    emb = load_tables(spark, SF_TEST_DIR)["embeddings"]
    rows = kcenter_select(emb, k=4).collect()
    radii = [r["radius"] for r in sorted(rows, key=lambda r: r["sel_round"])]
    assert radii[0] == 0.0
    # radii non-increasing after round 1 (greedy picks the farthest
    # first); equality allowed on degenerate layouts
    assert all(radii[i] >= radii[i + 1] for i in range(1, len(radii) - 1))


def test_funnel_time_bound_monotone_and_bounded(spark):
    """Stage populations shrink monotonically, and a click OUTSIDE the
    24h bound must not convert."""
    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from tests.conftest import SF_ORACLE_DIR

    rows = {r["stage"]: r["n_users"]
            for r in QUERY_REGISTRY["funnel_time_bound"](
                spark, SF_ORACLE_DIR).collect()}
    assert rows["view"] >= rows["click_24h"] >= rows["purchase_24h"]
    assert rows["purchase_24h"] >= 1  # non-degenerate at the gate SF


def test_doc_keywords_rank_is_dense_and_unique(spark):
    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from tests.conftest import SF_ORACLE_DIR

    rows = QUERY_REGISTRY["doc_keywords_topk"](
        spark, SF_ORACLE_DIR).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r["rank"])
    for d, ranks in per_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), d
        assert len(ranks) <= 3


def test_seasonal_naive_mase_matches_python_replay(spark):
    """Row-lagged MASE on a planted weekly-periodic series: the
    seasonal error must be exactly zero and the naive error positive."""
    from pyspark.sql import functions as F
    from spark_monotasks_spark.operators.timeseries import cusum_detect  # noqa: F401

    week = [10, 12, 14, 16, 18, 20, 22]
    rows = [("P", dt.date(2024, 1, 1) + dt.timedelta(days=i), week[i % 7])
            for i in range(28)]
    daily = spark.createDataFrame(rows, "priority string, day date, n long")
    from pyspark.sql import Window
    w = Window.partitionBy("priority").orderBy("day")
    lagd = daily.select(
        "priority", "n",
        F.lag("n", 7).over(w).alias("l7"),
        F.lag("n", 1).over(w).alias("l1"),
    ).filter(F.col("l7").isNotNull() & F.col("l1").isNotNull())
    out = lagd.groupBy("priority").agg(
        F.sum(F.abs(F.col("n") - F.col("l7"))).alias("es"),
        F.sum(F.abs(F.col("n") - F.col("l1"))).alias("en"),
    ).collect()[0]
    assert out["es"] == 0 and out["en"] > 0


def test_running_max_matches_single_partition_window(spark):
    """Two-pass distributed running max == the classic window form,
    inclusive and exclusive, on nondeterministic-order input."""
    from spark_monotasks_spark.operators.indexing import running_max

    vals = [5, 1, 9, 9, 2, 7, 0, 9, 3, 8, 4, 6]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    ).repartition(5)  # scramble physical order
    inc = {r["i"]: r["rm"]
           for r in running_max(df, "v", ["i"], "rm").collect()}
    exc = {r["i"]: r["rm"]
           for r in running_max(df, "v", ["i"], "rm",
                                exclusive=True).collect()}
    run = None
    for i, v in enumerate(vals):
        assert exc[i] == run, (i, exc[i], run)
        run = v if run is None else max(run, v)
        assert inc[i] == run, (i, inc[i], run)


def test_pareto_frontier_matches_bruteforce(spark):
    from spark_monotasks_spark.operators.sort import pareto_frontier_2d

    pts = [(1, 10, 1), (2, 9, 5), (3, 9, 4), (4, 5, 5), (5, 1, 9),
           (6, 3, 3), (7, 10, 1), (8, 0, 0), (9, 5, 5)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    # distinct frontier with min-id representative
    reduced = df.groupBy("x", "y").agg(F.min("id").alias("id"))
    got = sorted((r["id"], r["x"], r["y"])
                 for r in pareto_frontier_2d(reduced, "x", "y", "id")
                 .collect())
    uniq = {}
    for i, x, y in pts:
        uniq.setdefault((x, y), i)
    front = []
    for (x, y), i in uniq.items():
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for (qx, qy) in uniq
        )
        if not dominated:
            front.append((i, x, y))
    assert got == sorted(front)


def test_mad_outlier_matches_python(spark):
    from spark_monotasks_spark.operators.profile import mad_outlier_screen

    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.0, 500.0]  # one wild
    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate(vals)],
        "grp string, v double, id long",
    )
    out = mad_outlier_screen(df, "v", ["grp"], "id", k=3).collect()[0]
    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    lo, hi = cents[(n + 1) // 2 - 1], cents[(n + 2) // 2 - 1]
    med2 = lo + hi
    d = sorted(abs(2 * c - med2) for c in (round(v * 100) for v in vals))
    mad2 = d[(n + 1) // 2 - 1] + d[(n + 2) // 2 - 1]
    n_out = sum(1 for x in d if 2 * x > 3 * mad2)
    assert (out["n_rows"], out["med2"], out["mad2"], out["n_outliers"]) == (
        n, med2, mad2, n_out)
    assert out["n_outliers"] == 1  # exactly the planted wild point


def test_resample_linterp_exact_line(spark):
    """Interior gap points sit exactly on the line; observation buckets
    return the observation; value_e4 is half-up."""
    from spark_monotasks_spark.operators.timeseries import resample_linterp

    rows = [
        (1, _mkts(1, 0), 10.0),      # bucket 0: 1000 cents
        (1, _mkts(1, 3 * 3600), 40.0),  # bucket 3: 4000 cents
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {r["bucket_ts"]: r for r in
           resample_linterp(df, "k", "ts", "v", 3600).collect()}
    t0 = int(_mkts(1, 0).replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[t0]["val_num"] == 1000 and out[t0]["val_den"] == 1
    assert not out[t0]["interpolated"]
    # gap at +1h: line from (t0,1000) to (t0+3h,4000) -> 2000 cents
    g1 = out[t0 + 3600]
    assert g1["interpolated"]
    assert g1["val_num"] / g1["val_den"] == 2000.0
    assert g1["value_e4"] == 200000  # 20.0000 in ten-thousandths


def test_ancestor_closure_deep_chain(spark):
    """Doubling closure on a pure CHAIN (worst depth case) matches the
    python transitive closure, including exact distances."""
    from spark_monotasks_spark.graph.hierarchy import ancestor_closure

    n = 13  # chain 0 <- 1 <- 2 ... <- 12, depth 12 < max_depth 16
    edges = [(i, i - 1) for i in range(1, n)]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {(r["node"], r["anc"]): r["dist"]
           for r in ancestor_closure(df, max_depth=16).collect()}
    expect = {(i, j): i - j for i in range(1, n) for j in range(i)}
    assert got == expect


def test_subtree_rollup_matches_python(spark):
    from spark_monotasks_spark.graph.hierarchy import subtree_rollup

    # ternary tree over ids 0..12, value = id*10
    ids = list(range(13))
    parents = [(i, (i - 1) // 3) for i in ids if i >= 1]
    pdf = spark.createDataFrame(parents, "child long, parent long")
    vdf = spark.createDataFrame(
        [(i, i * 10) for i in ids], "id long, v long"
    )
    got = {r["id"]: (r["depth"], r["n_desc"], r["subtree_value"])
           for r in subtree_rollup(pdf, vdf, "id", "v").collect()}

    kids = defaultdict(list)
    for c, p in parents:
        kids[p].append(c)

    def walk(i):
        total, cnt = i * 10, 0
        for c in kids[i]:
            t, k = walk(c)
            total += t
            cnt += k + 1
        return total, cnt

    def depth(i):
        d = 0
        while i >= 1:
            i = (i - 1) // 3
            d += 1
        return d

    for i in ids:
        tot, cnt = walk(i)
        assert got[i] == (depth(i), cnt, tot), (i, got[i])


def test_fk_audit_zero_orphans_on_intact_relation(spark):
    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from tests.conftest import SF_ORACLE_DIR

    rows = {r["relationship"]: r for r in QUERY_REGISTRY[
        "fk_integrity_audit"](spark, SF_ORACLE_DIR).collect()}
    assert rows["lineitem.l_orderkey->orders"]["n_orphans"] == 0
    assert rows["orders.o_custkey->customer"]["n_orphans"] > 0  # planted
