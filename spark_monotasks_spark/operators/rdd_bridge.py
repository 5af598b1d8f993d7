"""RDD-passthrough odds — DataFrame-first facades for the last few
RDD.scala conveniences with no named equivalent elsewhere in this
package (SURVEY §2.9): ``glom`` (RDD.scala:782), ``takeSample``
(RDD.scala:664), raw ``pipe`` (RDD.scala:834 — the schema-aware
``script_transform`` supersedes it for real work; this facade keeps the
line-in/line-out contract for parity).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def glom_partitions(df: DataFrame) -> DataFrame:
    """RDD.glom (RDD.scala:782): coalesce each partition's rows into one
    array.  Returns (partition_id, rows array<struct>, n_rows).

    Genuinely ZERO shuffle: one Arrow-batched pass builds each
    partition's array locally (mapInArrow — one output row per
    non-empty partition), so no data ever leaves its task.  (The r4
    groupBy(spark_partition_id) form claimed zero-shuffle but Catalyst
    cannot know rows sharing a pid are co-located — it planned a hash
    Exchange whose "partial aggregates" carried the entire partition
    contents; fixed r5 per ADVICE.)

    By definition glom materializes whole partitions as single values —
    useful for partition-skew inspection (the n_rows histogram), not as
    a processing step; at scale keep ``spark.sql.files.maxPartitionBytes``
    sized so a glommed partition fits in one task's memory."""
    import pyarrow as pa
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    out_schema = StructType(
        [
            StructField("partition_id", IntegerType()),
            StructField("rows", ArrayType(StructType(df.schema.fields))),
            StructField("n_rows", LongType()),
        ]
    )

    def _glom(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        collected = list(batches)
        if not collected:  # empty partition: no row, like the groupBy form
            return
        tbl = pa.Table.from_batches(collected)
        structs = tbl.to_struct_array().combine_chunks()
        rows = pa.ListArray.from_arrays(
            pa.array([0, len(structs)], pa.int32()), structs
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], pa.int32()),
                rows,
                pa.array([len(structs)], pa.int64()),
            ],
            names=["partition_id", "rows", "n_rows"],
        )

    return df.mapInArrow(_glom, out_schema)


def take_sample(
    df: DataFrame, num: int, with_replacement: bool = False, seed: int = 42
) -> DataFrame:
    """RDD.takeSample (RDD.scala:664): an EXACT-size random sample as a
    DataFrame (the reference returned a driver-side array; staying
    distributed is the point of the facade).

    Without replacement: deterministic rank by a seeded hash draw and
    keep the top ``num`` — plans as TakeOrderedAndProject (bounded
    per-partition heap, no global sort).  With replacement: ``num``
    independent draws realized as a broadcast join against rows
    indexed by the distributed two-pass zipWithIndex shape
    (operators/indexing.py — range exchange + per-partition counts +
    broadcast offsets; never an un-partitioned global window).  The
    one extra count() pass is inherent to exact-size replacement
    sampling — prefer ``df.sample()`` when approximate size is fine.
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
    from spark_monotasks_spark.operators.indexing import zip_with_index

    spark = df.sparkSession
    n = df.count()
    if n == 0:
        return df.limit(0)
    draw = F.xxhash64(F.struct(*df.columns), F.lit(seed))
    indexed = zip_with_index(
        df.withColumn("_draw", draw), order_cols=["_draw"], index_col="_idx"
    ).drop("_draw")
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
