"""Sources & sinks (SURVEY §2.1) with reference SaveMode semantics.

Reference surface: parquet scan w/ pushdown + partition discovery
(parquet/newParquet.scala:863), JSON w/ sampled schema inference
(json/JsonRDD.scala:44 inferSchema, :156 compatibleType), JDBC
partitioned scan w/ WHERE pushdown (jdbc/JDBCRDD.scala:244,:256), text
(SparkContext.textFile), Hive-style partitioned writes, SaveMode
ErrorIfExists/Append/Overwrite/Ignore (DataFrame.scala:1013-1191,
sources/ddl.scala), JDBC sink (DataFrame.scala:1260,:1288).

All map 1:1 to modern DataFrameReader/Writer; the value added here is
(a) the parity surface, (b) scale defaults: partitioned parquet writes
with explicit partition columns give partition *pruning* on read, the
single most important 100 TB lever.
"""

from __future__ import annotations

import enum
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SaveMode(str, enum.Enum):
    """sources/ddl.scala SaveMode — identical names to the reference.

    Lookup is case-insensitive and accepts Spark's aliases ('error',
    'default') and the reference's CamelCase ('ErrorIfExists')."""

    ERROR_IF_EXISTS = "errorifexists"
    APPEND = "append"
    OVERWRITE = "overwrite"
    IGNORE = "ignore"

    @classmethod
    def _missing_(cls, value):
        if isinstance(value, str):
            norm = value.lower()
            if norm in ("error", "default"):
                return cls.ERROR_IF_EXISTS
            for m in cls:
                if m.value == norm:
                    return m
        return None


# --- reads -----------------------------------------------------------------

def read_parquet(spark: SparkSession, *paths: str, merge_schema: bool = False) -> DataFrame:
    """Parquet scan — column pruning + predicate pushdown + hive-style
    `k=v` partition discovery are native (ref parquet/newParquet.scala)."""
    return spark.read.option("mergeSchema", merge_schema).parquet(*paths)


def read_json(
    spark: SparkSession,
    path: str,
    schema: Any | None = None,
    sampling_ratio: float | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Line-delimited JSON with sampled schema inference — ref
    JsonRDD.scala:44 (`inferSchema`), samplingRatio SQLContext.scala:557."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", sampling_ratio)
    return reader.json(path)


def read_text(spark: SparkSession, path: str, whole_text: bool = False) -> DataFrame:
    """sc.textFile / wholeTextFiles equivalent (value column: `value`)."""
    return spark.read.option("wholetext", whole_text).text(path)


def read_csv(
    spark: SparkSession, path: str, schema: Any | None = None, header: bool = True, **options: Any
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.options(**options).csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: Any | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """ORC scan — the reference's Hive-module columnar format beside
    Parquet (sql/hive OrcRelation lineage; modern Spark's native
    vectorized ORC reader).  Same lever set as the parquet scan:
    predicate pushdown into ORC stripe/row-group statistics, column
    pruning, and hive-style `k=v` partition discovery + pruning.
    ``schema`` skips inference — required to read a directory a
    zero-row write left without data files (ORC, unlike parquet, writes
    no schema-bearing empty file)."""
    reader = spark.read.option("mergeSchema", merge_schema)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Raw-file ingest (`binaryFile` source): one row per file with
    (path, modificationTime, length, content) — how image/audio/video
    corpora enter the multimodal pipeline before the decode UDFs
    (pipeline/multimodal.py) take the `content` bytes.  ``glob`` filters
    by filename pattern BEFORE listing completes (pathGlobFilter);
    ``recursive`` descends nested dirs.  Spark parallelizes by file, so
    at 100 TB the unit of work is one file — pack small media into
    fewer, larger archives (or convert to parquet binary columns, the
    repo's canonical layout) rather than scanning millions of tiny
    files."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: Sequence[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC partitioned scan (jdbc/JDBCRDD.scala): either stride-partitioned
    on a numeric column or one partition per WHERE predicate; Catalyst
    pushes filters into the remote WHERE clause (compileFilter :244)."""
    props = properties or {}
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=list(predicates), properties=props)
    if partition_column is not None:
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or 8,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


# --- writes ----------------------------------------------------------------

def write_parquet(
    df: DataFrame,
    path: str,
    mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS,
    partition_by: Sequence[str] | None = None,
    compression: str = "snappy",
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink (ref DataFrame.scala:992 saveAsParquetFile).

    ``partition_by`` writes hive-style `k=v` dirs → readers get partition
    pruning.  ``max_records_per_file`` bounds file size at scale so a
    1000-executor read gets balanced splits."""
    writer = df.write.mode(str(SaveMode(mode).value)).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS) -> None:
    df.write.mode(str(SaveMode(mode).value)).json(path)


def write_csv(df: DataFrame, path: str, mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS, header: bool = True) -> None:
    df.write.mode(str(SaveMode(mode).value)).option("header", header).csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS,
    partition_by: Sequence[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink (counterpart of :func:`write_parquet`); ``partition_by``
    writes hive-style `k=v` dirs so ORC readers get partition pruning."""
    writer = df.write.mode(str(SaveMode(mode).value)).option(
        "compression", compression
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_text(df: DataFrame, path: str, mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS) -> None:
    """saveAsTextFile parity (PairRDDFunctions.scala:881) — single string col."""
    df.write.mode(str(SaveMode(mode).value)).text(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink — ref createJDBCTable/insertIntoJDBC (DataFrame.scala:1260)."""
    df.write.mode(str(SaveMode(mode).value)).jdbc(url, table, properties=properties or {})


def save_as_table(
    df: DataFrame,
    name: str,
    mode: SaveMode | str = SaveMode.ERROR_IF_EXISTS,
    format: str = "parquet",
    partition_by: Sequence[str] | None = None,
    bucket_by: tuple[int, Sequence[str]] | None = None,
) -> None:
    """saveAsTable (DataFrame.scala:1013-1191).  ``bucket_by=(n, cols)``
    writes bucketed output: repeated equi-joins/aggs on those cols skip
    the shuffle entirely — the co-located-join lever at 100 TB."""
    writer = df.write.mode(str(SaveMode(mode).value)).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(name)


def insert_overwrite_partitioned(
    spark,
    df: DataFrame,
    table: str,
    partition_cols: Sequence[str],
) -> None:
    """Hive-style ``INSERT OVERWRITE TABLE ... PARTITION`` with dynamic
    partitions against the session catalog (warehouse-dir-backed) —
    ref hive/execution/InsertIntoHiveTable.scala,
    hiveWriterContainers.scala:1 (the dynamic-partition writer).

    Creates the partitioned parquet table if absent, then runs the SQL
    INSERT OVERWRITE path.  ``partitionOverwriteMode=dynamic`` pins the
    reference semantics: only partitions PRESENT in the input are
    rewritten, untouched partitions survive — which is what makes this
    the idempotent-backfill primitive at 100 TB (re-run one day's
    pipeline, only that day's partitions rewrite; a static overwrite
    would truncate the table).
    """
    part = list(partition_cols)
    # Spark requires dynamic partition columns LAST in the projection
    cols = [c for c in df.columns if c not in part] + part
    src = df.select(*cols)
    view = f"_ins_src_{table}"
    src.createOrReplaceTempView(view)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    col_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({col_ddl}) USING parquet "
        f"PARTITIONED BY ({', '.join(part)})"
    )
    spark.sql(
        f"INSERT OVERWRITE TABLE {table} PARTITION ({', '.join(part)}) "
        f"SELECT * FROM {view}"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    order_cols: Sequence[str] = ("seq_id", "seq_offset"),
    max_records_per_file: int = 1_000_000,
    mode: SaveMode | str = SaveMode.OVERWRITE,
) -> None:
    """Training-shard sink: the last step of the packing pipeline
    (pipeline.text.pack_sequences → here).  Writes hive-partitioned
    parquet ``shard=k/`` directories with rows SORTED by ``order_cols``
    inside every file, so a data loader streams each shard in training
    order with zero shuffling or sorting at read time.

    Scale shape: repartition by the shard column (each shard's rows
    land in one task), sortWithinPartitions (no global sort — shard
    order is the only order a loader needs), ``maxRecordsPerFile``
    bounds file size so a 1000-worker loader gets balanced files.
    """
    (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, *order_cols)
        .write.mode(str(SaveMode(mode).value))
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(shard_col)
        .parquet(path)
    )
