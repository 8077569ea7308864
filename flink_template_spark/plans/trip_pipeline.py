"""The reference's flagship workload as a driver-visible query: trip-event
JSON lines → parse layer (JSONUtil.kt:127-168) → per-trip aggregation
(TripAggregatorApplication.kt:58-164, A1-A9).

Rows-only check (no oracle): the input is the engine's own wire-format
fixture, not a testdata parquet table, so there is no DuckDB view to
oracle against. The same analytics (haversine path distance, run-length
stopped time, span durations) ARE oracle-checked over the ``events``
table in plans.telemetry; this entry proves the end-to-end JSON pipeline
(parse → filter-malformed → aggregate) the reference actually ships.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flink_template_spark.operators.trip_agg import aggregate_trips
from flink_template_spark.parse import read_trip_events_json
from flink_template_spark.plans.registry import register
from flink_template_spark.sources.trip_fixtures import write_fixture


def _fixture_path() -> str:
    """Idempotently materialize the 20-line wire-format fixture.

    Known impurity: the first call of either query writes this file into
    the driver's tempdir (all later calls only stat it). Deliberate —
    the fixture is the QUERY INPUT (the engine's own wire format, not a
    testdata table), and shipping a data file inside the package or
    writing at import time would be worse; a rows-only smoke entry may
    lazily create its own tiny input."""
    d = os.path.join(tempfile.gettempdir(), "flink_template_spark_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "trip_events.jsonl")
    if not os.path.exists(p):
        write_fixture(p)
    return p


@register("q_trip_pipeline_json")
def q_trip_pipeline_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = read_trip_events_json(spark, _fixture_path())
    # 20-line fixture: re-scanning is cheaper than leaving a persisted
    # projection behind in the driver's long-lived session
    return aggregate_trips(parsed, materialize=False).orderBy("trip_id")


@register("q_trip_pipeline_datasource")
def q_trip_pipeline_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship pipeline fed by the custom ``tripjson`` Python Data
    Source (sources/trip_datasource.py) instead of the text reader —
    proves the Kafka-shaped source contract end-to-end. Rows-only for the
    same reason as q_trip_pipeline_json; parity between the two input
    paths is pinned by tests/test_trip_datasource.py."""
    from flink_template_spark.sources.trip_datasource import (
        read_trip_events_datasource,
    )

    parsed = read_trip_events_datasource(spark, _fixture_path(), num_partitions=4)
    return aggregate_trips(parsed, materialize=False).orderBy("trip_id")
