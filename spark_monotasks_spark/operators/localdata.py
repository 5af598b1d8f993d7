"""Driver-local row sets as DataFrames without the Python-worker tax.

``spark.createDataFrame(list)`` ships the rows through
``sc.parallelize`` with ``defaultParallelism`` slices: on a 32-core
session a FOUR-row quantile table becomes 32 pickled partitions, each
evaluated by a Python worker — measured ~0.55 s steady / ~2 s cold per
use at r8, pure overhead charged to every query that builds a small
literal relation (quantile grids, landmark lists, driver-computed
component maps).

Two regimes (guide §4: eliminate the Python boundary; §5: the driver
should do almost no data work):

* ``rows`` ≤ ``_VALUES_MAX`` and every cell a plain literal → an
  inline ``VALUES`` table: Catalyst folds it to a ``LocalTableScan``
  (LocalRelation) — ZERO tasks, no Python workers, and joins against
  it broadcast without running a job.  Measured ~0.07-0.1 s.
* bigger/unsupported rows → ``createDataFrame`` over an explicit
  ``sc.parallelize(rows, n)`` with n sized by ROW COUNT (one slice
  per ~50k rows) instead of one slice per core — the Python eval runs
  once per DATA chunk, not once per CPU.  Measured 0.59 s vs 2.1 s
  for 100k (id, component) pairs.

The VALUES path casts every column to the declared type, so the result
schema is exactly ``schema`` in both regimes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: above this, VALUES parse time beats the parallelize savings
#: (measured: 10k-row VALUES ~0.4 s parse — no better than parallelize)
_VALUES_MAX = 1024

#: parallelize fallback: one slice per this many rows (small driver
#: tables only — callers with genuinely big data use real scans)
_ROWS_PER_SLICE = 50_000


def _sql_literal(v, dt: T.DataType) -> str | None:
    """Render one cell as a Spark SQL literal; None if unsupported."""
    if v is None:
        return f"CAST(NULL AS {dt.simpleString()})"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return f"CAST('{v}' AS DOUBLE)"
        return repr(v)
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    return None


def local_rows_df(
    spark: SparkSession, rows: list, schema: str | T.StructType
) -> DataFrame:
    """Small driver-local row set → DataFrame, cheaply (see module doc).

    ``rows``: list of tuples (or 1-tuples); ``schema``: DDL string or
    StructType.  Semantically identical to
    ``spark.createDataFrame(rows, schema)`` for plain-literal cells.
    """
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    assert isinstance(st, T.StructType), f"need a struct schema, got {st}"
    if rows and len(rows) <= _VALUES_MAX:
        lits: list[str] = []
        ok = True
        for row in rows:
            cells = []
            for v, f in zip(row, st.fields):
                lit = _sql_literal(v, f.dataType)
                if lit is None:
                    ok = False
                    break
                cells.append(lit)
            if not ok or len(cells) != len(st.fields):
                ok = False
                break
            lits.append("(" + ",".join(cells) + ")")
        if ok:
            cols = ", ".join(
                f"CAST(c{i} AS {f.dataType.simpleString()}) AS `{f.name}`"
                for i, f in enumerate(st.fields)
            )
            alias = ",".join(f"c{i}" for i in range(len(st.fields)))
            # .to(st): align nullability with what createDataFrame
            # declares (VALUES infers non-null from the literals) so
            # the result schema is bit-identical to the old path
            return spark.sql(
                f"SELECT {cols} FROM VALUES {','.join(lits)} AS t({alias})"
            ).to(st)
    if not rows:
        return spark.createDataFrame([], st)
    # r8 second pass: rows above the VALUES bound go through ARROW when
    # the types allow — createDataFrame(pa.Table) ships the batch to
    # the JVM from the driver with NO Python workers at all.  The
    # row-count-sized parallelize fallback measured 1.2s for a 10k-row
    # component map (one slice = one serial Python decode feeding a
    # BroadcastExchange); the Arrow path is ~0.27s steady for the same
    # rows.  parallelize survives only for types Arrow can't carry.
    tbl = _arrow_table(rows, st)
    if tbl is not None:
        return spark.createDataFrame(tbl).to(st)
    n = max(1, min(
        spark.sparkContext.defaultParallelism,
        (len(rows) + _ROWS_PER_SLICE - 1) // _ROWS_PER_SLICE,
    ))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), st
    )


def _arrow_table(rows: list, st: T.StructType):
    """rows → pyarrow.Table for plain scalar schemas; None if any
    column type is outside the supported literal set."""
    import pyarrow as pa

    _PA = {
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(),
        T.StringType: pa.string(),
        T.BooleanType: pa.bool_(),
    }
    patypes = []
    for f in st.fields:
        patype = _PA.get(type(f.dataType))
        if patype is None:
            return None
        patypes.append(patype)
    try:
        cols = list(zip(*rows))
        arrays = [
            pa.array(list(c), type=t) for c, t in zip(cols, patypes)
        ]
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return None
    return pa.Table.from_arrays(
        arrays, schema=pa.schema(
            [
                pa.field(f.name, t, nullable=f.nullable)
                for f, t in zip(st.fields, patypes)
            ]
        )
    )
