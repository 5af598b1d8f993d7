"""Property-based sketch guarantees (pipeline/sketches.py).

The CMS bound (estimate ≥ true count, for EVERY key and any
depth/width) and histogram merge associativity must hold on arbitrary
inputs, not just the planted fixtures — randomized keys maximize
bucket-collision coverage at tiny widths, where the bound is actually
exercised (wide sketches never collide).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_monotasks_spark.pipeline import sketches

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1,
                 max_size=30)


@pytest.mark.parametrize("hash_family", ["md5", "xxhash64"])
@given(keys=_keys, depth=st.integers(1, 6), width=st.integers(2, 8))
@_SETTINGS
def test_cms_never_underestimates(spark, keys, depth, width, hash_family):
    """For any input multiset and any (depth, width) — including widths
    tiny enough to force collisions — est(key) >= count(key)."""
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    sk = sketches.cms_build(df, "key", depth=depth, width=width,
                            hash_family=hash_family)
    est = {
        r.key: r.est
        for r in sketches.cms_estimate(
            sk, df.select("key").distinct(), "key", depth, width, hash_family
        ).collect()
    }
    exact = Counter(keys)
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)


@given(
    vals=st.lists(st.floats(min_value=-50, max_value=50,
                            allow_nan=False, allow_infinity=False),
                  min_size=1, max_size=30),
    split=st.integers(0, 2),
    bin_width=st.sampled_from([0.5, 1.0, 7.0]),
)
@_SETTINGS
def test_histogram_merge_associative(spark, vals, split, bin_width):
    """Histogram of the whole == merge of arbitrary shard histograms,
    counter for counter (negative values and fractional bins included)."""
    rows = [(v, i % (split + 1)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v double, shard int")
    whole = {
        r.bin: r.cnt
        for r in sketches.histogram_build(df, "v", bin_width).collect()
    }
    parts = [
        sketches.histogram_build(
            df.filter(df.shard == s), "v", bin_width
        )
        for s in range(split + 1)
    ]
    merged = {
        r.bin: r.cnt for r in sketches.histogram_merge(*parts).collect()
    }
    assert whole == merged


@given(
    n=st.integers(10, 40),
    k=st.integers(1, 8),
    boosted=st.integers(0, 9),
    factor=st.sampled_from([2.0, 10.0, 1000.0]),
)
@_SETTINGS
def test_weighted_sample_monotone_in_weight(spark, n, k, boosted, factor):
    """A-Res law: raising ONE row's weight (others fixed) can never
    evict it from the sample — its key u^(1/w) rises while every other
    key is unchanged."""
    from spark_monotasks_spark.pipeline import text as T

    base = [(i, 1.0) for i in range(n)]
    df1 = spark.createDataFrame(base, "doc_id long, w double")
    got1 = {r.doc_id for r in T.weighted_sample_k(df1, k, "w").collect()}
    rows2 = [(i, factor if i == boosted else 1.0) for i in range(n)]
    df2 = spark.createDataFrame(rows2, "doc_id long, w double")
    got2 = {r.doc_id for r in T.weighted_sample_k(df2, k, "w").collect()}
    if boosted in got1:
        assert boosted in got2, (boosted, got1, got2)
    # and everything else is at most displaced by the boosted row
    assert got1 - {boosted} >= got2 - {boosted} or got1 == got2


@pytest.mark.parametrize("hash_family", ["md5", "xxhash64"])
@given(members=_keys, probes=_keys, m_words=st.integers(1, 4),
       k=st.integers(1, 6))
@_SETTINGS
def test_bloom_no_false_negatives(spark, members, probes, m_words, k,
                                  hash_family):
    """For ANY member set, probe set and (m_words, k) — including
    1-word filters where nearly every bit is set — a member key never
    probes False.  (k > 4 exercises the salted md5 rounds.)"""
    mdf = spark.createDataFrame([(x,) for x in members], "key string")
    sk = sketches.bloom_build(mdf, "key", m_words=m_words, k=k,
                              hash_family=hash_family)
    pdf = spark.createDataFrame(
        [(x,) for x in set(members) | set(probes)], "key string"
    )
    got = {
        r.key: r.might_contain
        for r in sketches.bloom_contains(
            pdf, "key", sk, m_words=m_words, k=k, hash_family=hash_family
        ).collect()
    }
    for x in set(members):
        assert got[x] is True, f"false negative for member {x!r}"


@given(members=_keys, split=st.integers(0, 29))
@_SETTINGS
def test_bloom_merge_equals_single_build(spark, members, split):
    """union-then-OR of two partial filters == one build over the
    concatenation, word for word (mergeability is exact)."""
    cut = min(split, len(members))
    a, b = members[:cut], members[cut:]
    dfa = spark.createDataFrame([(x,) for x in a] or [("zz",)], "key string")
    dfb = spark.createDataFrame([(x,) for x in b] or [("zz",)], "key string")
    both = spark.createDataFrame(
        [(x,) for x in (a or ["zz"]) + (b or ["zz"])], "key string"
    )
    merged = sketches.bloom_merge(
        sketches.bloom_build(dfa, "key", m_words=2, k=3),
        sketches.bloom_build(dfb, "key", m_words=2, k=3),
    )
    single = sketches.bloom_build(both, "key", m_words=2, k=3)
    as_map = lambda df: {r.word: r.bits for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(single)


def test_bloom_validates(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="m_words"):
        sketches.bloom_build(df, "key", m_words=0)
    with pytest.raises(ValueError, match="m_words"):
        sketches.bloom_contains(df, "key", df, k=0)
    with pytest.raises(ValueError, match="at least one"):
        sketches.bloom_merge()
