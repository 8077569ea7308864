"""Custom `tripjson` Python Data Source: batch + streaming parity with
the file-source path, offset bookkeeping, and bounded micro-batches."""

from __future__ import annotations

import time

from flink_template_spark.parse import read_trip_events_json
from flink_template_spark.sources.trip_datasource import (
    read_trip_events_datasource,
    read_trip_events_datasource_stream,
    register_trip_source,
)
from flink_template_spark.sources.trip_fixtures import fixture_lines, write_fixture


def test_batch_read_matches_text_source(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    write_fixture(str(p))

    via_ds = read_trip_events_datasource(spark, str(p), num_partitions=3)
    via_text = read_trip_events_json(spark, str(p))

    # ds adds partition/offset upstream; ingest_seq values are
    # source-layout-dependent by design (ordering semantics only)
    cols = [c for c in via_text.columns if c != "ingest_seq"]
    a = via_ds.select(cols)
    b = via_text.select(cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_batch_offsets_are_line_numbers(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    write_fixture(str(p))
    register_trip_source(spark)
    raw = (
        spark.read.format("tripjson")
        .option("path", str(p))
        .option("numPartitions", "4")
        .load()
    )
    rows = raw.orderBy("offset").collect()
    assert [r.offset for r in rows] == list(range(len(fixture_lines())))
    # every line range lands in exactly one partition
    assert len({(r.offset) for r in rows}) == len(rows)
    assert raw.rdd.getNumPartitions() == 4


def test_stream_read_drains_in_bounded_batches(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    write_fixture(str(p))
    n_valid = read_trip_events_json(spark, str(p)).count()

    parsed = read_trip_events_datasource_stream(
        spark, str(p), num_partitions=2, max_lines_per_batch=7
    )
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("tripds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql("SELECT count(*) c FROM tripds_stream").first().c
            if got >= n_valid:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert spark.sql("SELECT count(*) c FROM tripds_stream").first().c == n_valid
    # maxLinesPerBatch=7 over a 20-line log ⇒ several micro-batches, not one
    progress = q.recentProgress
    assert len([pr for pr in progress if pr["numInputRows"] > 0]) >= 3


def test_stream_picks_up_appended_lines(spark, tmp_path):
    """The log grows between triggers; the reader's latestOffset advances
    and only the new lines are read (incremental, replayable)."""
    p = tmp_path / "grow.jsonl"
    lines = fixture_lines()
    with open(p, "w") as f:
        f.write("\n".join(lines[:5]) + "\n")

    register_trip_source(spark)
    raw = (
        spark.readStream.format("tripjson")
        .option("path", str(p))
        .option("numPartitions", "2")
        .load()
    )
    q = (
        raw.writeStream.outputMode("append")
        .format("memory")
        .queryName("tripds_grow")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM tripds_grow").first().c >= 5:
                break
            time.sleep(0.3)
        with open(p, "a") as f:
            f.write("\n".join(lines[5:]) + "\n")
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM tripds_grow").first().c >= len(lines):
                break
            time.sleep(0.3)
    finally:
        q.stop()
    offs = [r.offset for r in spark.sql("SELECT offset FROM tripds_grow").collect()]
    assert sorted(offs) == list(range(len(lines)))  # no gaps, no re-reads


def test_stream_sessionization_over_datasource(spark, tmp_path):
    """The flagship stateful pipeline (parse → applyInPandasWithState
    sessionization) runs unchanged on the custom source — the Kafka-
    shaped contract is sufficient for the reference's whole topology."""
    from flink_template_spark.streaming.trip_sessions import sessionize_trips

    p = tmp_path / "events.jsonl"
    write_fixture(str(p))

    parsed = read_trip_events_datasource_stream(spark, str(p), num_partitions=2)
    out = sessionize_trips(parsed)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tripds_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline:
            rows = {
                r.trip_id: r
                for r in spark.sql("SELECT * FROM tripds_sessions").collect()
            }
            if len(rows) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert set(rows) == {1, 2, 3}
    assert rows[1].total_s == 55 and rows[1].stopped_s == 20
    assert rows[2].vehicle_id == "VIN00002"
