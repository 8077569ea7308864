"""Streaming trending top-k: each window's leaderboard is emitted
exactly once (at watermark close), equals the batch
window+count+row_number dual, and the per-window state is removed."""

from __future__ import annotations

import json

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_template_spark.streaming.topk_stream import (
    TOP_K,
    topk_fold,
    topk_rank,
    trending_topk_stream,
)

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"


def _lines(rows):
    return "\n".join(json.dumps(r) for r in rows) + "\n"


def _rows():
    # three days of skewed traffic + one far-future sentinel that
    # advances the watermark past every real window
    types = ["view", "click", "purchase", "signup"]
    rows = []
    eid = 0
    for day in range(1, 4):
        for i, t in enumerate(types):
            # day d: type i appears (10*d - 2*i) times -> distinct,
            # deterministic leaderboards that differ per day
            for _ in range(10 * day - 2 * i):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": f"2024-01-0{day} 0{(eid % 9) + 1}:00:00",
                        "user_id": eid % 5,
                        "event_type": t,
                    }
                )
                eid += 1
    sentinel = {
        "event_id": eid,
        "ts": "2024-02-01 00:00:00",
        "user_id": 0,
        "event_type": "view",
    }
    return rows, sentinel


def test_topk_fold_and_rank_pure():
    types, counts = topk_fold({"a": 2, "b": 1}, ([], []))
    types, counts = topk_fold({"b": 4, "c": 1}, (types, counts))
    assert dict(zip(types, counts)) == {"a": 2, "b": 5, "c": 1}
    # ties break by type name; k truncates
    assert topk_rank(["y", "x", "z"], [5, 5, 1], k=2) == [
        ("x", 5, 1),
        ("y", 5, 2),
    ]


def test_trending_topk_stream_equals_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows, sentinel = _rows()
    # split mid-day so one window's counts accumulate ACROSS batches;
    # the sentinel rides in the last file to close every real window
    third = len(rows) // 3
    (in_dir / "a.json").write_text(_lines(rows[:third]))
    (in_dir / "b.json").write_text(_lines(rows[third:]))
    (in_dir / "c.json").write_text(_lines([sentinel]))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    q = (
        trending_topk_stream(stream, watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("topk")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.window_start.isoformat(), r.event_type): (r.n, r.rk)
        for r in spark.sql("SELECT * FROM topk").collect()
    }

    batch = spark.createDataFrame(
        [tuple(r[k] for k in ("event_id", "ts", "user_id", "event_type"))
         for r in rows],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    wk = W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    expect = {
        (r.window_start.isoformat(), r.event_type): (r.n, r.rk)
        for r in (
            batch.groupBy(
                F.window("ts", "1 day")["start"].alias("window_start"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") <= TOP_K)
        ).collect()
    }
    assert got == expect
    # exactly one emission per (window, type): append-once contract
    assert len(got) == 3 * TOP_K
