"""Property-based set-operation semantics (SURVEY §2.7 / §7.4.3-4).

The reference mixes three UNION/EXCEPT semantics; these properties pin
each operator to its multiset model over randomized inputs INCLUDING
NULLs and duplicates — the places where the three semantics diverge.
One shared Spark session, many hypothesis examples per property: inputs
are tiny so each round-trip is driver-cheap.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_monotasks_spark.operators import setops

# rows: (nullable small int, small string) — collisions and NULLs likely
_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 3)),
    st.sampled_from(["a", "b"]),
)
_rows = st.lists(_row, max_size=8)

_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")  # type: ignore[arg-type]


def _bag(df) -> Counter:
    return Counter((r.k, r.v) for r in df.collect())


@given(a=_rows, b=_rows)
@_SETTINGS
def test_union_all_is_bag_sum(spark, a, b):
    got = _bag(setops.union_all(_df(spark, a), _df(spark, b)))
    assert got == Counter(a) + Counter(b)


@given(a=_rows, b=_rows)
@_SETTINGS
def test_union_distinct_is_set_union(spark, a, b):
    got = _bag(setops.union_distinct(_df(spark, a), _df(spark, b)))
    assert got == Counter(set(a) | set(b))


@given(a=_rows, b=_rows)
@_SETTINGS
def test_intersect_is_set_intersection(spark, a, b):
    got = _bag(setops.intersect(_df(spark, a), _df(spark, b)))
    assert got == Counter(set(a) & set(b))


@given(a=_rows, b=_rows)
@_SETTINGS
def test_except_reference_hybrid_model(spark, a, b):
    """RDD.subtract model (SubtractedRDD.scala:143-145): drop all left
    rows whose value occurs in right (NULLs compare equal); keep
    duplicates of survivors."""
    got = _bag(setops.except_reference(_df(spark, a), _df(spark, b)))
    bset = set(b)
    assert got == Counter(r for r in a if r not in bset)


@given(a=_rows, b=_rows)
@_SETTINGS
def test_except_all_is_multiset_difference(spark, a, b):
    got = _bag(setops.except_all(_df(spark, a), _df(spark, b)))
    assert got == Counter(a) - Counter(b)


@given(a=_rows, b=_rows)
@_SETTINGS
def test_except_distinct_is_set_difference(spark, a, b):
    got = _bag(setops.except_distinct(_df(spark, a), _df(spark, b)))
    assert got == Counter(set(a) - set(b))
