"""Local replica of the driver's correctness gate.

For every query with an oracle: run the Spark builder AND the DuckDB SQL
at sf0.01, compare row count, column names, and order-insensitive
values (sorted rows, with approximate equality for floats at 1e-9 —
stricter than any reasonable value-hash normalization).

Queries without an oracle get a rows-only smoke run.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tests.conftest import SF_ORACLE_DIR

from spark_monotasks_spark.tables import TABLE_NAMES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows, colnames):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat())
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def _query_names():
    from spark_monotasks_spark.queries import ORACLE_REGISTRY, QUERY_REGISTRY

    return sorted(QUERY_REGISTRY), ORACLE_REGISTRY


ALL_NAMES, _ = _query_names()


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_parity(spark, name):
    from spark_monotasks_spark.queries import ORACLE_REGISTRY, QUERY_REGISTRY

    sdf = QUERY_REGISTRY[name](spark, SF_ORACLE_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in ORACLE_REGISTRY:
        # rows-only check (mirrors the driver's weak gate)
        assert isinstance(spark_rows, list)
        return

    con = _duck(SF_ORACLE_DIR)
    res = con.execute(ORACLE_REGISTRY[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
