"""Property tests: as_of_join and range_join vs brute-force Python
references on randomized small inputs (keys collide, ties occur,
empty sides)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_monotasks_spark.operators.asof import as_of_join, range_join

_lrow = st.tuples(st.integers(0, 2), st.integers(0, 20))           # (k, ts)
_rrow = st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 99))
_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    lrows=st.lists(_lrow, min_size=1, max_size=6),
    rrows=st.lists(_rrow, max_size=6, unique_by=lambda r: (r[0], r[1])),
)
@_SETTINGS
def test_asof_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "i long, k long, ts long"
    )
    right = spark.createDataFrame(rrows, "k long, ts long, v long") if rrows else (
        spark.createDataFrame([], "k long, ts long, v long")
    )
    got = {r.i: (r.v_r, r.ts_r) for r in as_of_join(left, right, on="k").collect()}

    def brute(k, t):
        cands = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
        if not cands:
            return (None, None)
        rt, v = max(cands)  # latest ts wins; ts unique per key by strategy
        return (v, rt)

    expect = {i: brute(k, t) for i, (k, t) in enumerate(lrows)}
    assert got == expect


@given(
    lrows=st.lists(_lrow, min_size=1, max_size=6),
    rrows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 8)),
        max_size=5,
    ),
)
@_SETTINGS
def test_range_join_matches_bruteforce(spark, lrows, rrows):
    # right rows are (k, start, length) → interval [start, start+length]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "i long, k long, ts long"
    )
    intervals = [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(rrows)]
    right = spark.createDataFrame(
        intervals, "k long, start long, end long, j long"
    ) if intervals else spark.createDataFrame([], "k long, start long, end long, j long")
    got = sorted(
        (r.i, r.j)
        for r in range_join(left, right, on="k", bucket_width=5).collect()
    )
    expect = sorted(
        (i, j)
        for i, (k, t) in enumerate(lrows)
        for (rk, s, e, j) in intervals
        if rk == k and s <= t <= e
    )
    assert got == expect
