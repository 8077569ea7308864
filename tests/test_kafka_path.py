"""Kafka source path (reference S1: TripAggregatorApplication.kt:188-192).

Two layers, matching what this container can actually exercise:

1. ``test_kafka_wire_shape_parse_parity`` — ALWAYS runs: a batch
   DataFrame with Kafka's exact wire schema (binary key/value, topic,
   partition, offset, timestamp, timestampType) goes through the same
   ``CAST(value AS STRING)`` + ``parse_trip_events`` composition as
   ``read_trip_events_kafka`` and must produce rows identical to the
   file-source dual on the same payloads. This is the entire code path
   we own past ``.load()``.
2. ``test_kafka_stream_plan_builds`` — builds the real
   ``readStream.format("kafka")`` unresolved plan (no broker needed for
   plan construction). Skipped with an explicit reason when the Kafka
   connector jar is absent from the classpath (environment-blocked:
   live-broker e2e is impossible in this container either way).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _kafka_wire_df(spark, lines: list[str]):
    """Batch DataFrame with the Kafka source's exact output schema."""
    rows = [
        (None, line.encode("utf-8"), "testTopic", i % 3, i, None, 0)
        for i, line in enumerate(lines)
    ]
    return spark.createDataFrame(
        rows,
        "key BINARY, value BINARY, topic STRING, partition INT, "
        "offset LONG, timestamp TIMESTAMP, timestampType INT",
    )


def test_kafka_wire_shape_parse_parity(spark, tmp_path):
    from flink_template_spark.parse import parse_trip_events, read_trip_events_json
    from flink_template_spark.sources.trip_fixtures import fixture_lines

    lines = fixture_lines()

    # kafka path: wire schema -> CAST(value AS STRING) -> parse
    wire = _kafka_wire_df(spark, lines).selectExpr("CAST(value AS STRING) AS value")
    via_kafka_shape = parse_trip_events(wire)

    # file dual on the same payloads
    p = tmp_path / "events.jsonl"
    p.write_text("\n".join(lines) + "\n")
    via_file = read_trip_events_json(spark, str(p))

    assert via_kafka_shape.schema == via_file.schema
    cols = [c for c in via_kafka_shape.columns if c != "ingest_seq"]
    a = sorted(map(tuple, via_kafka_shape.select(*cols).collect()))
    b = sorted(map(tuple, via_file.select(*cols).collect()))
    assert a == b
    assert len(a) > 0


def test_kafka_stream_plan_builds(spark, tmp_path):
    from flink_template_spark.parse import (
        read_trip_events_json,
        read_trip_events_kafka,
    )

    try:
        df = read_trip_events_kafka(spark, "localhost:9092", "testTopic")
    except Exception as exc:  # connector jar absent -> DataSource lookup fails
        msg = str(exc)
        if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            pytest.skip(
                "kafka connector jar not on classpath (environment-blocked); "
                "wire-schema parity covered by test_kafka_wire_shape_parse_parity"
            )
        raise
    assert df.isStreaming
    # the parse layer must compose to the same schema as the batch dual
    p = tmp_path / "one.jsonl"
    p.write_text("{}\n")
    batch_schema = read_trip_events_json(spark, str(p)).schema
    assert df.schema == batch_schema
