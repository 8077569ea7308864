"""Streaming Markov transition counter: summed increments over any
micro-batch split must equal the batch LAG transition matrix over the
same ordered rows (q_event_markov's counts), and state must carry the
chain across the batch boundary (the boundary transition itself)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_template_spark import plans
from flink_template_spark.streaming.markov_stream import (
    markov_stream,
    transitions_fold,
)
from flink_template_spark.tables import load_table


def test_transitions_fold_carries_state():
    inc1, st = transitions_fold(
        [("view", 1, 10), ("click", 2, 11)], (None, -1, -1)
    )
    assert inc1 == {("view", "click"): 1}
    # the boundary transition (click -> purchase) belongs to batch 2
    inc2, st2 = transitions_fold([("purchase", 3, 12)], st)
    assert inc2 == {("click", "purchase"): 1}
    assert st2 == ("purchase", 3, 12)


def _write_time_split_batches(spark, sf_dir, out_dir, n_files=3):
    """The events table as JSON files split by time: per-user order is
    preserved across files, so batch-boundary transitions are real."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
    )
    rows = sorted(ev.collect(), key=lambda r: (r["ts_us"], r["event_id"]))
    chunk = (len(rows) + n_files - 1) // n_files
    import json
    import os

    os.makedirs(out_dir)
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        with open(os.path.join(out_dir, f"b{i}.jsonl"), "w") as fh:
            for r in part:
                fh.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts_us": r["ts_us"],
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                        }
                    )
                    + "\n"
                )
    return len(rows)


def test_stream_increments_sum_to_batch_matrix(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "ev_json")
    _write_time_split_batches(spark, sf_dir, in_dir, n_files=3)

    stream = (
        spark.readStream.schema(
            "event_id LONG, ts_us LONG, user_id LONG, event_type STRING"
        )
        .option("maxFilesPerTrigger", 1)  # three real micro-batches
        .json(in_dir)
        .select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
        )
    )
    q = (
        markov_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("markov_inc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.sql(
            "SELECT from_type, to_type, SUM(n) AS n FROM markov_inc "
            "GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r["from_type"], r["to_type"]): r["n_trans"]
        for r in plans.QUERIES["q_event_markov"](spark, sf_dir).collect()
    }
    assert got == want
    # the 3-way time split guarantees transitions ACROSS batch
    # boundaries existed; equality above proves the state carried them
    per_batch = spark.sql(
        "SELECT COUNT(DISTINCT from_type || '>' || to_type) AS k FROM markov_inc"
    ).collect()[0]["k"]
    assert per_batch == len(want)


def test_stream_replay_is_deterministic(spark, sf_dir, tmp_path):
    """Same input, two independent runs: identical emitted increments
    (the deterministic within-batch sort contract)."""
    in_dir = str(tmp_path / "ev_json2")
    _write_time_split_batches(spark, sf_dir, in_dir, n_files=2)

    def run(name):
        stream = (
            spark.readStream.schema(
                "event_id LONG, ts_us LONG, user_id LONG, event_type STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
            .select(
                "event_id",
                F.timestamp_micros(F.col("ts_us")).alias("ts"),
                "user_id",
                "event_type",
            )
        )
        q = (
            markov_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r["user_id"], r["from_type"], r["to_type"], r["n"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    assert run("mk_a") == run("mk_b")


def test_transitions_fold_rejects_out_of_order():
    """The carried (last_ts, last_id) is a load-bearing guard: a later
    batch delivering earlier data must fail loudly, not silently
    diverge from the batch matrix — including the same-microsecond
    case where only the id tiebreak is inverted."""
    _, st = transitions_fold(
        [("view", 100, 1), ("click", 200, 7)], (None, -1, -1)
    )
    with pytest.raises(ValueError, match="out-of-order"):
        transitions_fold([("purchase", 150, 9)], st)
    # same-microsecond, inverted id: the ts-only guard missed this
    with pytest.raises(ValueError, match="out-of-order"):
        transitions_fold([("purchase", 200, 3)], st)


def test_transitions_fold_rejects_exact_redelivery():
    """ADVICE r8: an at-least-once source re-delivering the exact last
    event ((ts, id) equal to the folded state) must fail loudly — the
    strict '<' guard alone would double-count the transition into it
    and silently diverge from the batch LAG matrix."""
    _, st = transitions_fold(
        [("view", 100, 1), ("click", 200, 7)], (None, -1, -1)
    )
    with pytest.raises(ValueError, match="re-delivery"):
        transitions_fold([("click", 200, 7)], st)
    # ...and a duplicate WITHIN one batch is the same defect
    with pytest.raises(ValueError, match="re-delivery"):
        transitions_fold(
            [("view", 100, 1), ("view", 100, 1)], (None, -1, -1)
        )
