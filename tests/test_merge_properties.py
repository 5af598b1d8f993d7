"""Property-based merge/CDC semantics (operators/merge.py) against an
executable Python model: for ANY base snapshot and change log —
duplicate keys, competing sequence numbers, deletes of absent keys,
inserts colliding with updates — the DataFrame algebra must equal the
obvious dict fold.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_monotasks_spark.operators.merge import apply_cdc, merge_upsert

_key = st.integers(0, 5)
_val = st.integers(-3, 3)
_base_rows = st.lists(st.tuples(_key, _val), max_size=6, unique_by=lambda r: r[0])
_update_rows = st.lists(st.tuples(_key, _val), max_size=5, unique_by=lambda r: r[0])
# change log: (key, value, op, seq) — seq unique so "latest" is well-defined
_log = st.lists(
    st.tuples(_key, _val, st.sampled_from(["I", "U", "D"]), st.integers(0, 99)),
    max_size=8,
    unique_by=lambda r: r[3],
)

_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame(
        [], schema
    )


@pytest.mark.slow
@given(base=_base_rows, updates=_update_rows)
@_SETTINGS
def test_merge_upsert_matches_dict_model(spark, base, updates):
    b = _df(spark, base, "k long, v long")
    u = _df(spark, updates, "k long, v long")
    got = {r.k: r.v for r in merge_upsert(b, u, ["k"]).collect()}
    model = dict(base)
    model.update(dict(updates))
    assert got == model


@pytest.mark.slow
@given(base=_base_rows, log=_log)
@_SETTINGS
def test_apply_cdc_matches_dict_model(spark, base, log):
    b = _df(spark, base, "k long, v long")
    c = _df(spark, log, "k long, v long, op string, seq long")
    got = {r.k: r.v for r in apply_cdc(b, c, ["k"]).collect()}
    model = dict(base)
    latest: dict = {}
    for k, v, op, seq in log:
        if k not in latest or seq > latest[k][2]:
            latest[k] = (v, op, seq)
    for k, (v, op, _seq) in latest.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model


# --- segment dedup vs model ------------------------------------------------

_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9)
_corpus = st.lists(_doc, min_size=1, max_size=5)


@pytest.mark.slow
@given(corpus=_corpus)
@_SETTINGS
def test_segment_dedup_matches_model(spark, corpus):
    from spark_monotasks_spark.pipeline.dedup import drop_duplicate_segments

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text_dedup
        for r in drop_duplicate_segments(df, seg_tokens=2).collect()
    }
    # model: first occurrence of each 2-token segment (by doc, pos) wins
    seen: set = set()
    expect = {}
    for i, toks in enumerate(corpus):
        segs = [" ".join(toks[j:j + 2]) for j in range(0, len(toks), 2)]
        kept = []
        for seg in segs:
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        expect[i] = " ".join(kept)
    assert got == expect


# --- time-series forward-fill vs model -------------------------------------

_obs = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-5, 5)),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],  # one obs per second keeps last-write trivial
)


@pytest.mark.slow
@given(obs=_obs)
@_SETTINGS
def test_resample_ffill_matches_model(spark, obs):
    from spark_monotasks_spark.operators.timeseries import resample_ffill

    rows = [("k", f"2024-01-01 00:00:{sec:02d}", float(v)) for sec, v in obs]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", st_col_ts("ts"), "v"
    )
    got = {
        r.bucket_ts: (r.value, r.filled)
        for r in resample_ffill(df, "k", "ts", "v", step_seconds=4).collect()
    }
    base = 1704067200
    by_bucket: dict = {}
    for sec, v in obs:
        b = base + (sec // 4) * 4
        cur = by_bucket.get(b)
        if cur is None or sec > cur[0]:
            by_bucket[b] = (sec, float(v))
    lo, hi = min(by_bucket), max(by_bucket)
    expect = {}
    last = None
    for b in range(lo, hi + 4, 4):
        if b in by_bucket:
            last = by_bucket[b][1]
            expect[b] = (last, False)
        else:
            expect[b] = (last, True)
    assert got == expect


def st_col_ts(name):
    from pyspark.sql import functions as F

    return F.col(name).cast("timestamp").alias("ts")


_scd2_updates = st.lists(
    st.tuples(_key, _val, st.integers(1, 9)),
    max_size=6,
    unique_by=lambda r: (r[0], r[2]),
)


@pytest.mark.slow
@given(base=_base_rows, updates=_scd2_updates)
@_SETTINGS
def test_scd2_apply_matches_model(spark, base, updates):
    """scd2_apply equals the obvious dict fold for ANY base/batch:
    latest-ts-per-key wins, no-op updates create no version, changed
    keys close-and-open, new keys open at their own ts."""
    from spark_monotasks_spark.operators.merge import scd2_apply

    dim = _df(
        spark,
        [(k, v, 0, None, True) for k, v in base],
        "k int, v int, valid_from int, valid_to int, is_current boolean",
    )
    upd = _df(spark, updates, "k int, v int, effective_ts int")
    out = scd2_apply(dim, upd, on=["k"], tracked=["v"], ts_col="effective_ts")
    got = [(r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect()]

    latest: dict[int, tuple[int, int]] = {}
    for k, v, ts in updates:
        if k not in latest or ts > latest[k][1]:
            latest[k] = (v, ts)
    exp = []
    for k, v in base:
        lv = latest.get(k)
        if lv is not None and lv[0] != v:
            exp.append((k, v, 0, lv[1], False))
            exp.append((k, lv[0], lv[1], None, True))
        else:
            exp.append((k, v, 0, None, True))
    base_keys = {k for k, _ in base}
    exp += [
        (k, v, ts, None, True)
        for k, (v, ts) in latest.items()
        if k not in base_keys
    ]
    norm = lambda t: (t[0], t[1], t[2], -1 if t[3] is None else t[3], t[4])
    assert sorted(got, key=norm) == sorted(exp, key=norm)


def test_scd2_stale_update_is_noop(spark):
    """An update whose ts precedes the open version's valid_from must
    NOT apply (it would close the version with valid_to < valid_from —
    inverted history, the r6 advisor finding); the dimension row
    survives untouched."""
    from spark_monotasks_spark.operators.merge import scd2_apply

    dim = _df(
        spark,
        [(1, 10, 5, None, True)],
        "k int, v int, valid_from int, valid_to int, is_current boolean",
    )
    upd = _df(spark, [(1, 99, 3)], "k int, v int, effective_ts int")
    out = scd2_apply(dim, upd, on=["k"], tracked=["v"], ts_col="effective_ts")
    got = [(r.k, r.v, r.valid_from, r.valid_to, r.is_current)
           for r in out.collect()]
    assert got == [(1, 10, 5, None, True)]
    # invariant on every closed row this function ever emits
    bad = out.filter("valid_to IS NOT NULL AND valid_to < valid_from")
    assert bad.count() == 0


def test_scd2_same_ts_ties_deterministic(spark):
    """Two updates for one key at the SAME effective_ts must pick a
    deterministic winner (max tracked value under the desc-nulls-last
    tiebreaker), independent of partition layout."""
    from spark_monotasks_spark.operators.merge import scd2_apply

    dim = _df(
        spark,
        [(1, 10, 0, None, True)],
        "k int, v int, valid_from int, valid_to int, is_current boolean",
    )
    results = set()
    for nparts in (1, 7):
        upd = _df(
            spark, [(1, 20, 5), (1, 30, 5)], "k int, v int, effective_ts int"
        ).repartition(nparts)
        out = scd2_apply(
            dim, upd, on=["k"], tracked=["v"], ts_col="effective_ts"
        )
        results.add(
            tuple(sorted(
                (r.k, r.v, r.valid_from,
                 -1 if r.valid_to is None else r.valid_to, r.is_current)
                for r in out.collect()
            ))
        )
    assert len(results) == 1  # layout-independent
    rows = set(next(iter(results)))
    assert (1, 30, 5, -1, True) in rows  # max tracked value wins the tie
    assert (1, 10, 0, 5, False) in rows


def test_personalized_pagerank_isolated_seed_ranked(spark):
    """A seed absent from the edge set holds its reset mass instead of
    vanishing (r6 advisor finding)."""
    from spark_monotasks_spark.graph.algorithms import personalized_pagerank

    edges = _df(spark, [(1, 2), (2, 3)], "src long, dst long")
    ranks = {r.id: r.rank
             for r in personalized_pagerank(edges, [99], num_iters=3).collect()}
    assert 99 in ranks
    assert abs(ranks[99] - 0.15) < 1e-9  # reset mass, nothing flows in
    assert ranks[1] == 0.0  # non-seed source gets nothing
