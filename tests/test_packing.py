"""pack_greedy invariants beyond the corpus oracle: bins never overflow
(except a single oversized doc), bin ids are contiguous per group, and
chunked offsets stay inside the budget."""

from __future__ import annotations

from flink_template_spark.operators.packing import pack_chunked, pack_greedy

BUDGET = 100


def _pack(spark, rows):
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tokens"])
    return pack_greedy(df, BUDGET).collect()


def test_greedy_invariants(spark):
    rows = [
        ("en", i, n)
        for i, n in enumerate([30, 30, 30, 30, 150, 10, 90, 20, 1, 99])
    ] + [("de", 100 + i, 60) for i in range(5)]
    out = _pack(spark, rows)
    assert len(out) == len(rows)
    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r["lang"], r["bin_id"]), []).append(r["n_tokens"])
    for (lang, b), sizes in by_bin.items():
        assert sum(sizes) <= BUDGET or len(sizes) == 1, (lang, b, sizes)
    for lang in ("en", "de"):
        bins = sorted({r["bin_id"] for r in out if r["lang"] == lang})
        assert bins == list(range(len(bins)))
    # greedy next-fit never opens a new bin while the doc fits the open one:
    # replay sequentially and compare exactly.
    for lang in ("en", "de"):
        seq = sorted(
            (r for r in out if r["lang"] == lang), key=lambda r: r["doc_id"]
        )
        bin_id, filled = 0, 0
        for i, r in enumerate(seq):
            n = r["n_tokens"]
            if i > 0 and filled + n > BUDGET:
                bin_id, filled = bin_id + 1, n
            else:
                filled += n
            assert r["bin_id"] == bin_id


def test_chunked_offsets_within_budget(spark):
    rows = [("en", i, 37) for i in range(20)]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tokens"])
    out = pack_chunked(df, BUDGET).collect()
    assert len(out) == 20
    for r in out:
        assert 0 <= r["offset_in_bin"] < BUDGET
    starts = sorted((r["bin_id"] * BUDGET + r["offset_in_bin"]) for r in out)
    assert starts == [37 * i for i in range(20)]
