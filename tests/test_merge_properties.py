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
