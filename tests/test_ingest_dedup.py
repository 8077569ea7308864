"""Streaming ingest dedup: within-batch near-dups collapse, later
arrivals dedup against everything accepted earlier, novel docs pass."""

from __future__ import annotations

import json
import time

from flink_template_spark.streaming.ingest_dedup import (
    accepted_docs,
    dedup_batch_against_index,
    start_ingest_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing in the garden all morning"
)
NEAR = BASE.replace("warm", "sunny")  # one-token edit → near-dup
NOVEL = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines today"
)
SCHEMA = "doc_id LONG, text STRING"


def test_batch_core_within_and_against_corpus(spark):
    b1 = spark.createDataFrame([(1, BASE), (2, NEAR)], "doc_id long, text string")
    novel, bands = dedup_batch_against_index(spark, b1, None)
    assert [r.doc_id for r in novel.collect()] == [1]  # lowest id wins

    b2 = spark.createDataFrame(
        [(3, BASE + " extra"), (4, NOVEL)], "doc_id long, text string"
    )
    novel2, _ = dedup_batch_against_index(
        spark, b2, bands.select("band", "band_key")
    )
    assert [r.doc_id for r in novel2.collect()] == [4]  # 3 ≈ corpus doc 1


def test_short_docs_without_shingles_pass(spark):
    b = spark.createDataFrame([(7, "hi"), (8, "yo")], "doc_id long, text string")
    novel, bands = dedup_batch_against_index(spark, b, None)
    assert sorted(r.doc_id for r in novel.collect()) == [7, 8]
    assert bands.count() == 0


def test_streaming_ingest_grows_index(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    root = str(tmp_path / "corpus")

    def write_batch(name, rows):
        (in_dir / name).write_text(
            "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows) + "\n"
        )

    write_batch("b1.jsonl", [(1, BASE), (2, NEAR)])
    stream = spark.readStream.schema(SCHEMA).json(str(in_dir))
    q = start_ingest_dedup(
        stream, root, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    write_batch("b2.jsonl", [(3, BASE + " tail"), (4, NOVEL)])
    stream = spark.readStream.schema(SCHEMA).json(str(in_dir))
    q = start_ingest_dedup(
        stream, root, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    got = sorted(r.doc_id for r in accepted_docs(spark, root).collect())
    assert got == [1, 4]  # 2 dropped in-batch, 3 dropped against corpus
