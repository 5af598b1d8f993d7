"""Custom external data source via the Python DataSource API — closes
SURVEY §2.1 row 9 (the reference's sql.sources external-datasource
trait family: RelationProvider / TableScan / PrunedFilteredScan,
sql/core/src/main/scala/org/apache/spark/sql/sources/interfaces.scala)
with the modern PySpark equivalent instead of a JVM trait.

`SyntheticEventsDataSource` is a deterministic generator source —
`spark.read.format("synthetic_events").option("n", ...).load()` — that
demonstrates every contract point the reference's API had:

- schema declaration (fixed StructType, like `BaseRelation.schema`);
- PARTITIONED reads (`DataSourceReader.partitions` → one
  `InputPartition` per slice, like `TableScan.buildScan`'s RDD
  partitions — rows are generated executor-side per partition, the
  driver never materializes data);
- filter pushdown (`pushFilters` accepts `EqualTo`/`GreaterThan`/
  `LessThan` on event_id, mirroring `PrunedFilteredScan`; unsupported
  filters are returned to Spark for post-filtering).

Determinism makes it oracle-able: row i is a closed-form function of i,
so DuckDB can re-derive the exact relation from `range()`.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: closed-form row model: event_id i → (i, type_i, value_i)
_EVENT_TYPES = ("view", "click", "purchase", "error")


def _row(i: int):
    return (i, _EVENT_TYPES[i % 4], round((i * 37 % 997) / 10.0, 1))


SYNTHETIC_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        """PrunedFilteredScan parity: handle range/equality on event_id
        by shrinking the generated range; yield back anything else for
        Spark-side evaluation."""
        for f in filters:
            handled = False
            attr = f.attribute[0] if getattr(f, "attribute", None) else None
            if attr == "event_id":
                cls = type(f).__name__
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    handled = True
                elif cls == "GreaterThan":
                    self.lo = max(self.lo, int(f.value) + 1)
                    handled = True
                elif cls == "GreaterThanOrEqual":
                    self.lo = max(self.lo, int(f.value))
                    handled = True
                elif cls == "LessThan":
                    self.hi = min(self.hi, int(f.value))
                    handled = True
                elif cls == "LessThanOrEqual":
                    self.hi = min(self.hi, int(f.value) + 1)
                    handled = True
            if not handled:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = max(1, (hi - lo + self.num_partitions - 1) // self.num_partitions)
        return [
            _Slice(s, min(s + span, hi)) for s in range(lo, hi, span)
        ] or [_Slice(lo, lo)]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        # executor-side generation: the driver ships only (start, end)
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return SYNTHETIC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('synthetic_events').

    Also enables `spark.sql.python.filterPushdown.enabled` (a runtime
    SQL conf, off by default): a reader that implements pushFilters
    hard-errors on sessions without it — including the vanilla
    getOrCreate session an external harness builds."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# sink side — CreatableRelationProvider parity (interfaces.scala), via the
# Python DataSource writer API: JSONL directory sink with per-partition
# task files + driver-side commit manifest (the InsertableRelation shape).
# ---------------------------------------------------------------------------

import json
import os
import uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlDirWriter(DataSourceWriter):
    """Each task writes one `part-<uuid>.jsonl` (executor-side, append-
    safe under speculation because file names are unique); `commit`
    runs on the driver and records the manifest — the two-phase
    contract the reference's InsertIntoDataSource path relied on."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages):
        manifest = {
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return JsonlDirWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonlDirStreamWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)


# ---------------------------------------------------------------------------
# streaming sink — the DStream-era saveAsTextFiles/foreachRDD sink family
# re-expressed as a Python DataSourceStreamWriter: per-batch task files,
# per-batch commit manifests (exactly-once bookkeeping by batch id).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter


class JsonlDirStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir stream sink requires option 'path'")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages, batchId) -> None:
        manifest = {
            "batch": batchId,
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(
            os.path.join(self.path, f"_BATCH_{batchId}.json"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


# ---------------------------------------------------------------------------
# streaming source — external stream connector parity (the reference's
# external/kafka KafkaUtils receiver model, KafkaUtils.scala:44) as a
# fully offline-exercisable Python SimpleDataSourceStreamReader: a
# deterministic event feed with offset tracking (initialOffset / read /
# readBetweenOffsets for replay after failure / commit).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offsets are row indices into the same closed-form feed the batch
    reader generates; each micro-batch advances by ``batchSize`` until
    ``n`` rows have been emitted.  readBetweenOffsets replays a batch
    deterministically — the recovery contract a Kafka-style source
    needs."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch_size = int(options.get("batchSize", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_size, self.n)
        if hi == lo:
            # drained: the wrapper probes emptiness with next(it) — must
            # be an iterator
            return (iter([]), {"pos": lo})
        # advancing: a LIST, not a generator — the prefetch cache
        # copy.copy()s the container when the batch is planned
        return ([_row(i) for i in range(lo, hi)], {"pos": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return [_row(i) for i in range(int(start["pos"]), int(end["pos"]))]

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — offsets are pure indices
