"""SELECT TRANSFORM (script transformation) shim — SURVEY §2.11.

Reference: hive/execution/ScriptTransformation.scala:67 feeds rows to an
external process over stdin (tab-separated, one row per line — the
default HiveScriptIOSchema :295) and parses stdout back into rows.  The
AMPLab BDB query 4 (BigDataBenchmarkSuite.scala:105-121) uses it to run
a python URL-extraction script over a crawl table.

Spark-first design: ``mapInPandas`` launches ONE process per partition
(not per row), streams the partition's rows through it Arrow-batch by
Arrow-batch, and parses stdout with the same tab-separated contract.
This is the distributed equivalent of the reference's per-task script —
at 1000 executors each partition runs its own script instance, no
driver involvement, no collect.

``rdd.pipe`` would also work but loses Arrow batching and schema.
"""

from __future__ import annotations

import subprocess
import threading
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def script_transform(
    df: DataFrame,
    command: Sequence[str],
    output_schema: T.StructType | str,
    input_cols: Sequence[str] | None = None,
    field_sep: str = "\t",
    split_output: bool = True,
) -> DataFrame:
    """TRANSFORM(cols) USING 'command' AS (schema).

    The command receives ``field_sep``-joined input columns on stdin
    (one row per line) and must emit ``field_sep``-joined output rows on
    stdout.  Output fields are cast to ``output_schema`` types.  Row
    count may differ from input (the script is a generator, like the
    reference's UDTF-shaped TRANSFORM).  ``split_output=False`` keeps
    each stdout line whole as the single output column (the raw
    RDD.pipe contract — see operators.rdd_bridge.pipe_lines) instead of
    field-splitting it.
    """
    cols = list(input_cols or df.columns)
    schema = (
        T._parse_datatype_string(output_schema)
        if isinstance(output_schema, str)
        else output_schema
    )
    names = [f.name for f in schema.fields]
    n_out = len(names)
    if not split_output and n_out != 1:
        raise ValueError(
            "split_output=False keeps whole lines, so output_schema must "
            f"declare exactly one column (got {n_out})"
        )
    cmd = list(command)
    #: integral input columns: Arrow→pandas widens int-with-nulls to
    #: float64, which would serialize as '3.0'/'nan' — re-narrow first
    int_cols = {
        f.name
        for f in df.schema.fields
        if f.name in cols and f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint")
    }

    #: rows per emitted Arrow batch on the stdout side — bounds peak
    #: memory to O(batch), never O(partition)
    out_batch_rows = 10_000

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            encoding="utf-8",  # executor locale (often C) must not decide
        )
        assert proc.stdin is not None and proc.stdout is not None

        # Writer thread streams input Arrow-batch by Arrow-batch while the
        # main thread reads stdout incrementally: peak memory stays
        # O(one batch) on each side of the pipe regardless of partition
        # size, and a script that emits as it reads (the common generator
        # shape) can never deadlock on the OS pipe buffer.
        def feed() -> None:
            try:
                for pdf in batches:
                    sub = pdf[cols].copy()
                    for c in int_cols:
                        # nullable int, no .0 suffix
                        sub[c] = sub[c].astype("Int64")
                    lines = [
                        field_sep.join(
                            "" if pd.isna(v) else str(v) for v in row
                        )
                        for row in sub.itertuples(index=False)
                    ]
                    if lines:
                        proc.stdin.write("\n".join(lines) + "\n")
            except BrokenPipeError:
                pass  # script exited early; wait() below surfaces the rc
            finally:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

        writer = threading.Thread(target=feed, daemon=True)
        writer.start()

        # Hive TRANSFORM row contract: missing trailing fields → NULL,
        # extra fields ignored (HiveScriptIOSchema)
        records: list[list[str | None]] = []
        for line in proc.stdout:
            line = line.rstrip("\n")
            if not line:
                continue
            if split_output:
                records.append(
                    (line.split(field_sep) + [None] * n_out)[:n_out]
                )
            else:
                records.append([line])
            if len(records) >= out_batch_rows:
                yield pd.DataFrame(records, columns=names)
                records = []
        if records:
            yield pd.DataFrame(records, columns=names)
        writer.join()
        if proc.wait() != 0:
            raise RuntimeError(f"script {cmd!r} exited {proc.returncode}")

    out = df.mapInPandas(run_partition, schema=T.StructType(
        [T.StructField(f.name, T.StringType()) for f in schema.fields]
    ))
    # cast the string contract to the declared schema (JVM-side casts)
    from pyspark.sql import functions as F

    return out.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
