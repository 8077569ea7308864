"""Loader contract tests: events.ts normalization is schema-driven.

The testdata stores events.ts as parquet TIMESTAMP(MICROS) (Spark reads
TIMESTAMP_NTZ natively); an int64-nanos input (surfaced as LongType by
spark.sql.legacy.parquet.nanosAsLong) must be floored to micros. Both
paths must yield identical timestamps for the same instants.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import TimestampNTZType, TimestampType


def test_load_events_micros_passthrough(spark, sf_dir):
    from flink_template_spark.tables import load_events

    df = load_events(spark, sf_dir)
    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, (TimestampNTZType, TimestampType))
    assert df.limit(5).count() == 5


def test_load_events_nanos_normalized(spark, tmp_path):
    """int64-nanos ts floors to micros and matches the native-micros read."""
    from flink_template_spark.tables import load_events

    base_us = [1_700_000_000_000_000, 1_700_000_000_123_456]
    # +999 ns exercises flooring (not rounding) to micros
    nanos = [us * 1000 + 999 for us in base_us]

    def write(dirname: str, ts_array: pa.Array) -> str:
        d = tmp_path / dirname
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([10, 20], pa.int64()),
                "event_type": pa.array(["view", "click"]),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d)

    d_nanos = write("nanos", pa.array(nanos, pa.timestamp("ns")))
    d_us = write("micros", pa.array(base_us, pa.timestamp("us")))

    got_nanos = [r.ts for r in load_events(spark, d_nanos).orderBy("event_id").collect()]
    got_us = [r.ts for r in load_events(spark, d_us).orderBy("event_id").collect()]
    assert got_nanos == got_us
