"""Streaming quality gate: the corpus-quality expressions compose into
Structured Streaming (filter + near-dup suppression in one stream), and
the repetition metrics obey their algebraic invariants on adversarial
inputs."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_streaming_quality_gate_filters_and_dedups(spark, tmp_path):
    """quality_score is a pure Column expression, so it drops straight
    into a stream ahead of dedup_near_stream; the gate must (a) drop the
    low-quality doc, (b) keep one of the near-identical pair, (c) pass
    the distinct good docs."""
    from flink_template_spark.functions.text import quality_score
    from flink_template_spark.streaming.windows import dedup_near_stream

    good1 = "the quick brown fox jumps over a lazy dog near the river bank today"
    good2 = "a completely different sentence with the usual words and a calm tone"
    rows = [
        (1, "2024-01-01 00:00:01", good1),
        (2, "2024-01-01 00:00:02", "!!!???!!!"),  # punctuation junk → low quality
        (3, "2024-01-01 00:00:03", good1),  # near-dup of 1 (same profile)
        (4, "2024-01-01 00:00:04", good2),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    import json

    (src / "part0.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "ts": ts, "text": t}) for i, ts, t in rows
        )
    )
    stream = (
        spark.readStream.schema("doc_id LONG, ts STRING, text STRING")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    gated = dedup_near_stream(
        stream.filter(quality_score(F.col("text")) >= 0.3), watermark="10 seconds"
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("quality_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM quality_gate").collect()}
    assert 2 not in got  # low quality dropped
    assert 4 in got  # distinct good doc kept
    assert len(got & {1, 3}) == 1  # near-dup pair collapsed to one


def test_repetition_metrics_invariants(spark):
    """Algebraic invariants on crafted docs: all-distinct text has zero
    dup fractions; a constant doc maxes them; fractions stay in [0,1]."""
    from flink_template_spark.plans.quality import _tagged_grams

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # all distinct
            (2, "x x x x x x"),  # fully repeated
            (3, "one two one two one two"),  # periodic
            (4, "solo"),  # single token: no bigrams/trigrams
        ],
        "doc_id LONG, text STRING",
    )
    counts = (
        _tagged_grams(docs)
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = (
        counts.groupBy("doc_id", "n")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("dst"),
            F.max("c").alias("top"),
        )
        .collect()
    )
    stats = {(r.doc_id, r.n): (r.total, r.dst, r.top) for r in per}
    # doc 1: six distinct words
    assert stats[(1, 1)] == (6, 6, 1)
    # doc 2: one word repeated six times; bigrams all identical
    assert stats[(2, 1)] == (6, 1, 6)
    assert stats[(2, 2)] == (5, 1, 5)
    # doc 3: 2 distinct words, bigram alternation has 2 distinct forms
    assert stats[(3, 1)] == (6, 2, 3)
    assert stats[(3, 2)] == (5, 2, 3)
    # doc 4: no bigram/trigram rows at all
    assert (4, 2) not in stats and (4, 3) not in stats
    assert stats[(4, 1)] == (1, 1, 1)


def test_dedup_increment_short_docs_are_kept(spark):
    """Documents with fewer than 3 tokens have no shingles — the
    incremental dedup must still report them (is_dup false), and an
    exact copy of a corpus doc must match it."""
    from flink_template_spark.operators.dedup import (
        minhash_band_index,
        minhash_dedup_increment,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id LONG, text STRING"
    )
    newbies = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # exact copy → dup of 1
            (11, "tiny"),  # < 3 tokens → no shingles
            (12, "completely unrelated words here now"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: (r.is_dup, r.matched_corpus_id)
        for r in minhash_dedup_increment(newbies, minhash_band_index(corpus)).collect()
    }
    assert out[10] == (True, 1)
    assert out[11] == (False, None)
    assert out[12] == (False, None)
