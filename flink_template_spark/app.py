"""The reference application as one call — the Spark dual of
``TripAggregatorApplication.main()`` (TripAggregatorApplication.kt:54,
SURVEY.md §3 entry point 1):

    kafka/file source → JSON parse (drop malformed) → 3 s watermark →
    key by trip → processing-time sessionization → sink, checkpointed.

Sinks: "console" (the reference's rows.print()), "memory" (tests), or
any foreachBatch callable (e.g. the JDBC upsert from sinks.py — the
reference's disabled S3-S5 path, enabled).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

from flink_template_spark.parse import (
    read_trip_events_kafka,
    read_trip_events_stream,
)
from flink_template_spark.streaming.trip_sessions import sessionize_trips

CHECKPOINT_INTERVAL = "5 seconds"  # reference: enableCheckpointing(5000)


def run_trip_pipeline(
    spark: SparkSession,
    source_path: str | None = None,
    kafka_servers: str | None = None,
    kafka_topic: str = "testTopic",
    checkpoint_dir: str = "/tmp/trip_pipeline_ckpt",
    sink: str | Callable = "console",
    query_name: str = "trip_sessions",
):
    """Start the full trip pipeline; returns the StreamingQuery.

    Exactly one of ``source_path`` (file stream) or ``kafka_servers``
    must be given. ``sink``: "console" | "memory" | a
    ``foreachBatch(df, epoch_id)`` callable.
    """
    if (source_path is None) == (kafka_servers is None):
        raise ValueError("give exactly one of source_path or kafka_servers")
    parsed = (
        read_trip_events_stream(spark, source_path)
        if source_path
        else read_trip_events_kafka(spark, kafka_servers, kafka_topic)
    )
    sessions = sessionize_trips(parsed)
    # processingTime trigger ≈ the reference's 5 s checkpoint cadence
    writer = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=CHECKPOINT_INTERVAL)
    )
    if callable(sink):
        return writer.foreachBatch(sink).start()
    if sink == "memory":
        return writer.format("memory").queryName(query_name).start()
    return writer.format("console").start()
