"""`tripjson` — a custom Spark 4 Python Data Source for trip-event logs.

The reference consumes trip events from Kafka
(TripAggregatorApplication.kt:188-192): a partitioned, offset-addressed,
replayable log of JSON strings. This module rebuilds that *contract* as a
first-class Spark data source using the Python Data Source API
(`pyspark.sql.datasource`), with JSON-line files standing in for the
broker (no Kafka in this container). The emitted schema mirrors Kafka's
connector columns — ``value``, ``partition``, ``offset`` — so every
downstream plan (``parse.parse_trip_events`` → sessionize → aggregate) is
byte-identical to the Kafka path and swapping the real broker back in is
a one-line format change.

Batch usage::

    spark.dataSource.register(TripJsonDataSource)
    df = spark.read.format("tripjson").option("path", p).load()

Streaming usage (offset-tracked, replayable, exactly-once with
checkpointing)::

    df = (spark.readStream.format("tripjson")
          .option("path", p).option("maxLinesPerBatch", 100).load())

Scale notes: partition planning splits the log into ``numPartitions``
contiguous line ranges, so reads parallelize across executors exactly
like Kafka topic-partitions; the stream reader's offsets are plain line
counts — monotonic, checkpointable, and replay-deterministic, which is
what makes recovery exactly-once (same property Kafka offsets give the
reference's 5 s checkpoints, TripAggregatorApplication.kt:244).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("value", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
    ]
)


class _LineRange(InputPartition):
    def __init__(self, index: int, path: str, start: int, end: int):
        self.index = index
        self.path = path
        self.start = start  # inclusive line offset
        self.end = end  # exclusive line offset


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
    return [path]


def _count_lines(path: str) -> int:
    n = 0
    for fp in _list_files(path):
        with open(fp, "rb") as f:
            n += sum(1 for _ in f)
    return n


def _read_lines(path: str, start: int, end: int) -> Iterator[tuple[str, int]]:
    """Yield (line, global_offset) for log lines in [start, end)."""
    seen = 0
    for fp in _list_files(path):
        if seen >= end:
            return
        with open(fp, "rb") as f:
            for raw in f:
                if seen >= end:
                    return
                if seen >= start:
                    yield raw.decode("utf-8", errors="replace").rstrip("\n"), seen
                seen += 1


def _split_ranges(path: str, start: int, end: int, n: int) -> list[_LineRange]:
    total = end - start
    n = max(1, min(n, total)) if total > 0 else 1
    ranges = []
    for i in range(n):
        lo = start + (total * i) // n
        hi = start + (total * (i + 1)) // n
        ranges.append(_LineRange(i, path, lo, hi))
    return ranges


class _TripJsonBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        return _split_ranges(self.path, 0, _count_lines(self.path), self.num_partitions)

    def read(self, partition: _LineRange):
        for line, off in _read_lines(partition.path, partition.start, partition.end):
            yield (line, partition.index, off)


class _TripJsonStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batch reader over the line log.

    ``maxLinesPerBatch`` caps each micro-batch (Kafka's
    ``maxOffsetsPerTrigger`` analogue) so a large backlog drains in
    bounded, checkpointable steps instead of one giant batch.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.num_partitions = int(options.get("numPartitions", "4"))
        self.max_per_batch = int(options.get("maxLinesPerBatch", "0"))  # 0 = all
        self._planned = 0  # highest offset already handed to Spark

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # Called on the driver each trigger; a growing file is picked up
        # incrementally, exactly like new Kafka records. Rate limiting
        # MUST happen here, not in partitions(): whatever this returns is
        # the end offset Spark checkpoints for the batch, so clamping
        # later would silently skip the clamped-off lines.
        total = _count_lines(self.path)
        if self.max_per_batch <= 0:
            self._planned = total
            return {"offset": total}
        self._planned = min(total, self._planned + self.max_per_batch)
        return {"offset": self._planned}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["offset"]), int(end["offset"])
        # After a checkpoint recovery the committed start can be ahead of
        # this fresh reader's _planned; re-sync so pacing resumes from it.
        self._planned = max(self._planned, hi)
        return _split_ranges(self.path, lo, max(lo, hi), self.num_partitions)

    def read(self, partition: _LineRange):
        for line, off in _read_lines(partition.path, partition.start, partition.end):
            yield (line, partition.index, off)

    def commit(self, end: dict) -> None:
        # Offsets are durable in the checkpoint log; the source itself is
        # a file, so there is nothing to acknowledge (Kafka would no-op
        # too — the connector tracks offsets in the checkpoint, not the
        # broker).
        pass


class TripJsonDataSource(DataSource):
    """``format("tripjson")`` — Kafka-shaped replayable trip-event log."""

    @classmethod
    def name(cls) -> str:
        return "tripjson"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _TripJsonBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _TripJsonStreamReader(self.options)


def register_trip_source(spark) -> None:
    """Idempotently register the ``tripjson`` format on a session."""
    spark.dataSource.register(TripJsonDataSource)


def read_trip_events_datasource(spark, path: str, num_partitions: int = 8):
    """Batch read via the custom source → parsed trip events (same
    downstream plan as the Kafka path in ``parse``)."""
    from flink_template_spark.parse import parse_trip_events

    register_trip_source(spark)
    raw = (
        spark.read.format("tripjson")
        .option("path", path)
        .option("numPartitions", str(num_partitions))
        .load()
    )
    return parse_trip_events(raw)


def read_trip_events_datasource_stream(
    spark, path: str, num_partitions: int = 4, max_lines_per_batch: int = 0
):
    """Streaming read via the custom source → parsed trip events."""
    from flink_template_spark.parse import parse_trip_events

    register_trip_source(spark)
    raw = (
        spark.readStream.format("tripjson")
        .option("path", path)
        .option("numPartitions", str(num_partitions))
        .option("maxLinesPerBatch", str(max_lines_per_batch))
        .load()
    )
    return parse_trip_events(raw)
