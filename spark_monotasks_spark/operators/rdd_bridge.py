"""RDD-passthrough odds — DataFrame-first facades for the last few
RDD.scala conveniences with no named equivalent elsewhere in this
package (SURVEY §2.9): ``glom`` (RDD.scala:782), ``takeSample``
(RDD.scala:664), raw ``pipe`` (RDD.scala:834 — the schema-aware
``script_transform`` supersedes it for real work; this facade keeps the
line-in/line-out contract for parity).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def glom_partitions(df: DataFrame) -> DataFrame:
    """RDD.glom (RDD.scala:782): coalesce each partition's rows into one
    array.  Returns (partition_id, rows array<struct>, n_rows).

    By definition this materializes whole partitions as single values —
    useful for partition-skew inspection (the n_rows histogram), not as
    a processing step; at scale keep ``spark.sql.files.maxPartitionBytes``
    sized so a glommed partition fits in one task's memory.  Zero
    shuffle: spark_partition_id is map-side and the groupBy key IS the
    partitioning, so AQE keeps it local."""
    cols = df.columns
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(F.col("_pid").alias("partition_id"))
        .agg(
            F.collect_list(F.struct(*cols)).alias("rows"),
            F.count("*").alias("n_rows"),
        )
    )


def take_sample(
    df: DataFrame, num: int, with_replacement: bool = False, seed: int = 42
) -> DataFrame:
    """RDD.takeSample (RDD.scala:664): an EXACT-size random sample as a
    DataFrame (the reference returned a driver-side array; staying
    distributed is the point of the facade).

    Without replacement: deterministic rank by a seeded hash draw and
    keep the top ``num`` — plans as TakeOrderedAndProject (bounded
    per-partition heap, no global sort).  With replacement: ``num``
    independent draws realized as a broadcast range join against
    row_number-indexed rows (two shuffles of (index, row) pairs; the
    one extra count() pass is inherent to exact-size replacement
    sampling — prefer ``df.sample()`` when approximate size is fine).
    """
    if num < 0:
        raise ValueError("cannot take a negative number of sample rows")
    if num == 0:
        return df.limit(0)
    if not with_replacement:
        draw = F.xxhash64(F.struct(*df.columns), F.lit(seed))
        return (
            df.withColumn("_draw", draw)
            .orderBy("_draw")
            .limit(num)
            .drop("_draw")
        )
    spark = df.sparkSession
    n = df.count()
    if n == 0:
        return df.limit(0)
    w = Window.orderBy(F.xxhash64(F.struct(*df.columns), F.lit(seed)))
    indexed = df.withColumn("_idx", F.row_number().over(w) - 1)
    picks = spark.range(num).select(
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n)).alias("_idx")
    )
    return indexed.join(F.broadcast(picks), on="_idx").drop("_idx")


def pipe_lines(
    df: DataFrame, command: Sequence[str], field_sep: str = "\t"
) -> DataFrame:
    """RDD.pipe (RDD.scala:834) parity: stream rows through an external
    command line-by-line, yielding raw output lines as (line string).
    One process per partition, Arrow-batched — a thin specialization of
    operators.transform.script_transform (which adds typed output
    schemas; use it for real work)."""
    from spark_monotasks_spark.operators.transform import script_transform

    return script_transform(
        df,
        command,
        output_schema="line string",
        field_sep=field_sep,
        split_output=False,
    )
