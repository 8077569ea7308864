"""Distributed BPE trainer: golden merges on a hand-computable corpus,
determinism, and encode consistency."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark):
    # "low" x5, "lower" x2, "newest" x6, "widest" x3  (the classic
    # Sennrich et al. teaching example)
    rows = []
    for w, k in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        rows.extend([(i, w) for i in range(k)])
    texts = [" ".join(w for _, w in rows)]
    return spark.createDataFrame([(0, texts[0])], "doc_id LONG, text STRING")


def test_bpe_golden_first_merges(spark):
    from flink_template_spark.operators.bpe import learn_bpe

    merges, vocab = learn_bpe(_corpus(spark), n_merges=4, batch=1)
    # hand-derived: es(9) -> es+t(9) -> est</w>(9) -> lo(7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got["newest"] == ["n", "e", "w", "est</w>"]
    assert got["low"] == ["lo", "w", "</w>"]


def test_bpe_batched_agrees_on_global_max_and_stays_valid(spark):
    from flink_template_spark.operators.bpe import learn_bpe

    serial, _ = learn_bpe(_corpus(spark), n_merges=6, batch=1)
    batched, vocab = learn_bpe(_corpus(spark), n_merges=6, batch=3)
    # batching changes later picks (counts evolve between serial steps)
    # but the global max is the global max either way...
    assert serial[0] == batched[0] == ("e", "s")
    # ...picks within one batch never share a symbol (the safety rule)...
    assert len(batched) == 6
    for i in range(0, len(batched), 3):
        seen = set()
        for a, b in batched[i : i + 3]:
            assert a not in seen and b not in seen
            seen.update((a, b))
    # ...and the final vocab is a valid segmentation: symbols rebuild
    # each word exactly
    for r in vocab.collect():
        assert "".join(r.syms).removesuffix("</w>") == r.word


def test_bpe_determinism(spark):
    from flink_template_spark.operators.bpe import learn_bpe

    m1, _ = learn_bpe(_corpus(spark), n_merges=5, batch=2)
    m2, _ = learn_bpe(_corpus(spark), n_merges=5, batch=2)
    assert m1 == m2


def test_bpe_encode_matches_training_vocab(spark):
    from flink_template_spark.operators.bpe import (
        _symbolize,
        encode_words,
        learn_bpe,
        word_frequencies,
    )

    docs = _corpus(spark)
    merges, trained = learn_bpe(docs, n_merges=6, batch=1)
    fresh = _symbolize(word_frequencies(docs))
    encoded = encode_words(fresh, merges)
    a = {r.word: list(r.syms) for r in trained.collect()}
    b = {r.word: list(r.syms) for r in encoded.collect()}
    assert a == b
