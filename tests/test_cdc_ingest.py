"""Streaming CDC chunk-store ingest: chunks dedup against everything
stored earlier, within-batch first occurrence wins, and the two-epoch
stream's accounting equals the batch audit (q_cdc_chunk_dedup) when
arrival order matches doc_id order."""

from __future__ import annotations

import json

from flink_template_spark.streaming.cdc_ingest import (
    chunk_store,
    doc_stats,
    ingest_batch_against_store,
    start_cdc_ingest,
)

SCHEMA = "doc_id LONG, text STRING, source STRING"

SHARED = " ".join(f"tok{i % 89}v{(i * 11) % 97}" for i in range(300))


def _docs():
    return [
        (1, SHARED, "a"),
        (2, " ".join(f"one{i}" for i in range(60)), "a"),
        (3, "prefix0 prefix1 prefix2 " + SHARED, "b"),  # shifted copy of 1
        (4, SHARED, "b"),  # exact copy of 1
        (5, " ".join(f"five{i}" for i in range(80)), "c"),
    ]


def test_batch_core_dedups_within_and_against_store(spark):
    rows = _docs()
    b1 = spark.createDataFrame(rows[:2], SCHEMA)
    novel1, stats1 = ingest_batch_against_store(b1, None)
    s1 = {r["doc_id"]: r for r in stats1.collect()}
    # empty store: every chunk of batch 1 is new
    assert s1[1]["n_new"] == s1[1]["n_chunks"]
    assert s1[1]["chars_new"] == s1[1]["chars_total"]

    store = novel1.select("chash")
    b2 = spark.createDataFrame(rows[2:], SCHEMA)
    novel2, stats2 = ingest_batch_against_store(b2, store)
    s2 = {r["doc_id"]: r for r in stats2.collect()}
    # doc 4 is an exact copy of stored doc 1: zero new storage
    assert s2[4]["n_new"] == 0 and s2[4]["chars_new"] == 0
    # doc 3 (shifted copy) re-synchronizes: most chars dedup
    assert s2[3]["chars_new"] < s2[3]["chars_total"] * 0.25
    # doc 5 is novel
    assert s2[5]["chars_new"] == s2[5]["chars_total"]
    # the store never receives a hash twice
    n1 = {r["chash"] for r in novel1.collect()}
    n2 = {r["chash"] for r in novel2.collect()}
    assert not (n1 & n2)


def test_streaming_two_epochs_match_batch_audit(spark, tmp_path, monkeypatch):
    """Arrival order == doc_id order ⇒ the stream's per-source stored
    characters equal the batch audit's chars_first exactly (same
    chunking code, same first-occurrence winner)."""
    import flink_template_spark.plans.text_dedup as TD

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    root = str(tmp_path / "store")
    rows = _docs()

    def write_batch(name, batch):
        (in_dir / name).write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": t, "source": s})
                for i, t, s in batch
            )
            + "\n"
        )

    write_batch("b1.jsonl", rows[:2])
    stream = spark.readStream.schema(SCHEMA).json(str(in_dir))
    q = start_cdc_ingest(stream, root, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    write_batch("b2.jsonl", rows[2:])
    stream = spark.readStream.schema(SCHEMA).json(str(in_dir))
    q = start_cdc_ingest(stream, root, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    stats = doc_stats(spark, root)
    got = {
        r["source"]: (r["chars_new"], r["chars_total"])
        for r in stats.groupBy("source")
        .agg({"chars_new": "sum", "chars_total": "sum"})
        .withColumnRenamed("sum(chars_new)", "chars_new")
        .withColumnRenamed("sum(chars_total)", "chars_total")
        .collect()
    }

    docs = spark.createDataFrame(rows, SCHEMA)
    monkeypatch.setattr(TD, "load_table", lambda s, sd, t: docs)
    batch_audit = {
        r["source"]: (r["chars_first"], r["chars_total"])
        for r in TD.q_cdc_chunk_dedup(spark, "x").collect()
    }
    assert got == batch_audit

    # store holds each chunk exactly once, and reassembly is possible:
    # total stored chars equal the batch audit's global kept chars
    store = chunk_store(spark, root)
    assert store.count() == store.select("chash").distinct().count()
    assert store.agg({"clen": "sum"}).collect()[0][0] == sum(
        v[0] for v in batch_audit.values()
    )


def test_epoch_replay_is_idempotent_and_lossless(spark, tmp_path):
    """THE replay property, exercised through the real epoch function:
    a crashed attempt of epoch N already wrote chunks/epoch=N; the
    replay must NOT read its own prior output as "already stored" (r7
    review: that emptied the novel set and the overwrite deleted the
    only copies). After replaying epoch 1 twice, the store content and
    stats are byte-identical to a single clean run."""
    from flink_template_spark.streaming.cdc_ingest import process_epoch

    root = str(tmp_path / "store")
    rows = _docs()
    b1 = spark.createDataFrame(rows[:2], SCHEMA)
    b2 = spark.createDataFrame(rows[2:], SCHEMA)
    process_epoch(b1, 0, root)
    process_epoch(b2, 1, root)  # the "crashed" first attempt of epoch 1
    before_chunks = sorted(
        (r["chash"], r["clen"]) for r in chunk_store(spark, root).collect()
    )
    before_stats = sorted(
        tuple(r) for r in doc_stats(spark, root).collect()
    )
    process_epoch(b2, 1, root)  # the replay
    after_chunks = sorted(
        (r["chash"], r["clen"]) for r in chunk_store(spark, root).collect()
    )
    after_stats = sorted(tuple(r) for r in doc_stats(spark, root).collect())
    assert after_chunks == before_chunks  # nothing deleted, nothing duplicated
    assert after_stats == before_stats
    store = chunk_store(spark, root)
    assert store.count() == store.select("chash").distinct().count()
