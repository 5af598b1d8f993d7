"""NULL-semantics properties (SURVEY §7.4.5): join keys, aggregation
keys/values, and sort null-ordering pinned to explicit models over
randomized inputs.  These are the semantics the reference hand-rolled
(3-valued predicates, RowOrdering nulls-first-asc, hash-map group keys)
and the easiest places for an engine swap to drift.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_key = st.one_of(st.none(), st.integers(0, 3))
_val = st.one_of(st.none(), st.integers(-5, 5))
_rows = st.lists(st.tuples(_key, _val), max_size=8)

_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int")  # type: ignore[arg-type]


@given(a=_rows, b=_rows)
@_SETTINGS
def test_inner_join_null_keys_never_match(spark, a, b):
    """Equi-join NULL keys match nothing (predicates.scala 3-valued
    EqualTo) — model: pair count per non-null key."""
    got = (
        _df(spark, a)
        .join(_df(spark, b).withColumnRenamed("v", "w"), on="k")
        .count()
    )
    bk = Counter(k for k, _ in b if k is not None)
    expected = sum(bk[k] for k, _ in a if k is not None)
    assert got == expected


@given(a=_rows, b=_rows)
@_SETTINGS
def test_left_join_unmatched_null_padded(spark, a, b):
    """HashOuterJoin LeftOuter: every left row appears; unmatched
    (including all NULL-keyed) rows null-pad the right side."""
    rows = (
        _df(spark, a)
        .join(_df(spark, b).withColumnRenamed("v", "w"), on="k", how="left")
        .collect()
    )
    bk = Counter(k for k, _ in b if k is not None)
    expected_n = sum(max(bk[k], 1) if k is not None else 1 for k, _ in a)
    assert len(rows) == expected_n
    for r in rows:
        if r.k is None:
            assert r.w is None  # NULL key can never have matched


@given(rows=_rows)
@_SETTINGS
def test_groupby_null_is_a_group_and_agg_null_handling(spark, rows):
    """Aggregate.scala hash-map keys: NULL is a real group key.
    count(v) skips NULLs, count(*) doesn't, sum of all-NULL is NULL."""
    got = {
        r.k: (r.n_star, r.n_v, r.s)
        for r in _df(spark, rows)
        .groupBy("k")
        .agg(
            F.count("*").alias("n_star"),
            F.count("v").alias("n_v"),
            F.sum("v").alias("s"),
        )
        .collect()
    }
    model: dict = defaultdict(lambda: [0, 0, None])
    for k, v in rows:
        m = model[k]
        m[0] += 1
        if v is not None:
            m[1] += 1
            m[2] = v if m[2] is None else m[2] + v
    assert got == {k: tuple(m) for k, m in model.items()}


@given(rows=_rows)
@_SETTINGS
def test_sort_nulls_first_asc_last_desc(spark, rows):
    """SortOrder.scala fixed null ordering: NULLs first ascending —
    and Spark's desc default (nulls last) is its mirror."""
    asc = [r.k for r in _df(spark, rows).orderBy(F.col("k").asc(), F.col("v")).collect()]
    n_null = sum(1 for k, _ in rows if k is None)
    assert all(k is None for k in asc[:n_null])
    assert asc[n_null:] == sorted(k for k, _ in rows if k is not None)
    desc = [r.k for r in _df(spark, rows).orderBy(F.col("k").desc(), F.col("v")).collect()]
    if n_null:
        assert all(k is None for k in desc[-n_null:])
