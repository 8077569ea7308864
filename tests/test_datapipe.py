"""Training-data pipeline ops: split determinism, sampling proportions."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_template_spark.plans.datapipe import split_of
from flink_template_spark.tables import load_table


def test_split_is_deterministic_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = docs.withColumn("split", split_of()).select("doc_id", "split")
    b = docs.withColumn("split", split_of()).select("doc_id", "split")
    # same rows both evaluations (pure function of doc_id)
    assert a.exceptAll(b).count() == 0
    # every doc in exactly one split; ratios near 80/10/10
    counts = dict(
        (r.split, r["count"]) for r in a.groupBy("split").count().collect()
    )
    total = sum(counts.values())
    assert total == docs.count()
    assert 0.7 < counts["train"] / total < 0.9
    assert 0.05 < counts["val"] / total < 0.17
    assert 0.05 < counts["test"] / total < 0.17


def test_split_survives_join_roundtrip(spark, sf_dir):
    """The split of a record must not change when recomputed after a
    join — the backfill-reproducibility property hash splitting buys."""
    docs = load_table(spark, sf_dir, "documents")
    with_split = docs.withColumn("split", split_of())
    rejoined = (
        with_split.select("doc_id", "split")
        .join(docs, "doc_id")
        .withColumn("split2", split_of())
    )
    assert rejoined.filter(F.col("split") != F.col("split2")).count() == 0


def test_stratified_sample_proportions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.sampleBy("lang", {l: 0.5 for l in ["en", "de", "fr", "es", "zh"]}, seed=42)
    per_lang = dict(
        (r.lang, r["count"]) for r in docs.groupBy("lang").count().collect()
    )
    got = dict(
        (r.lang, r["count"]) for r in sample.groupBy("lang").count().collect()
    )
    for lang, n in per_lang.items():
        if n >= 40:  # enough mass for the Bernoulli bound to be tight
            assert 0.3 * n <= got.get(lang, 0) <= 0.7 * n
    # determinism: same seed, same sample
    again = docs.sampleBy(
        "lang", {l: 0.5 for l in ["en", "de", "fr", "es", "zh"]}, seed=42
    )
    assert sample.exceptAll(again).count() == 0


def test_training_shards_layout_and_determinism(spark, sf_dir, tmp_path):
    """Every shard directory gets exactly one data file; membership and
    within-shard order are pure functions of doc_id (two writes agree
    row-for-row); the union of shards is the input."""
    import glob
    import os

    from flink_template_spark.plans.datapipe import N_SHARDS, write_training_shards

    docs = load_table(spark, sf_dir, "documents")
    p1, p2 = str(tmp_path / "sh1"), str(tmp_path / "sh2")
    write_training_shards(docs, p1)
    write_training_shards(docs, p2)

    dirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(p1, "shard=*")))
    assert dirs == [f"shard={i}" for i in range(N_SHARDS)]
    for d in glob.glob(os.path.join(p1, "shard=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1

    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    assert r1.count() == docs.count()
    # identical membership + content across independent writes
    assert r1.exceptAll(r2).count() == 0 and r2.exceptAll(r1).count() == 0
    # shard id matches the portable hash contract
    from flink_template_spark.plans.datapipe import _shard_hash

    bad = r1.filter(
        (F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)") % N_SHARDS)
        != F.col("shard")
    )
    assert bad.count() == 0


def test_training_data_pipeline_invariants(spark, sf_dir):
    """The composed pipeline respects the token budget (except
    single-doc overflow bins), is deterministic across runs, and its
    dedup stage actually removes exact copies."""
    from flink_template_spark import plans

    q = plans.QUERIES["q_training_data_pipeline"]
    rows = q(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bin_tokens <= 512 or r.n_docs == 1
        assert 0 <= r.shard < 8
    cells = {r.cell for r in rows}
    assert all("/" in c for c in cells)  # split/lang cells
    again = q(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_rendezvous_shard_minimal_movement(spark, sf_dir):
    """THE consistent-hashing property: growing N shards to N+1 moves
    only the docs whose new shard's weight beats their previous max —
    ~1/(N+1) of the corpus in expectation. hash%N would move ~N/(N+1).
    Also: every moved doc must move TO the new shard (a rendezvous
    invariant — existing shards' weights are unchanged)."""
    from flink_template_spark.plans.datapipe import rendezvous_shard
    from flink_template_spark.tables import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        "doc_id",
        rendezvous_shard("doc_id", 8).alias("s8"),
        rendezvous_shard("doc_id", 9).alias("s9"),
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("s8") != F.col("s9")).cast("int")).alias("moved"),
        F.sum(
            ((F.col("s8") != F.col("s9")) & (F.col("s9") != 8)).cast("int")
        ).alias("moved_wrong"),
    ).first()
    assert agg["moved_wrong"] == 0
    frac = agg["moved"] / agg["n"]
    # expectation 1/9 ~ 11%; generous bound still far below hash%N's ~89%
    assert frac < 0.25, frac


def test_priority_sample_fixed_size_and_weight_bias(spark, sf_dir):
    """Priority sampling draws exactly min(k, |stratum|) docs per
    language, never repeats a doc, and — the point of weighting —
    over-represents heavy (long) docs: the selected mean n_chars must
    exceed the corpus mean."""
    from flink_template_spark.plans import registry
    from flink_template_spark.plans.datapipe import _PRIORITY_K
    from flink_template_spark.tables import load_table

    from pyspark.sql import functions as F

    sel = registry.QUERIES["q_priority_sample"](spark, sf_dir)
    rows = sel.collect()
    assert len(rows) == len({r["doc_id"] for r in rows})
    docs = load_table(spark, sf_dir, "documents").filter("n_chars > 0")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    per_lang: dict = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    for lang, n in sizes.items():
        assert per_lang.get(lang, 0) == min(_PRIORITY_K, n), lang
    sel_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sel_mean > corpus_mean


def test_rendezvous_shard_degenerate_counts(spark):
    """n_shards=1 returns shard 0 for every row (greatest needs two
    args, so the single-shard case short-circuits); n_shards=0 raises."""
    import pytest

    from flink_template_spark.plans.datapipe import rendezvous_shard

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    out = df.select(rendezvous_shard("doc_id", 1).alias("s")).collect()
    assert {r["s"] for r in out} == {0}
    with pytest.raises(ValueError):
        rendezvous_shard("doc_id", 0)


def test_morton_matches_python_reference(spark):
    """Bit-interleave correctness on the full 16x16 grid against a
    pure-Python reference (catches any shift/position transposition)."""
    from flink_template_spark.functions.zorder import morton_interleave

    from pyspark.sql import functions as F

    def ref(x, y, bits=4):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y"), 4).alias("z")
        ).collect()
    }
    assert got == {(x, y): ref(x, y) for x, y in rows}
    # the 256 keys are a permutation of 0..255 (no collisions)
    assert sorted(got.values()) == list(range(256))


def test_zorder_partitions_are_aligned_tiles(spark, sf_dir):
    """The scale claim q_zorder_layout makes: top-bit partitions of a
    Morton key are ALIGNED tiles, so every partition's quantized
    bounding box spans at most 1/4 of EACH dimension (16 of 64 cells
    at 6-bit quantization, 4-bit partition prefix) — the both-column
    skipping property a single-column sort cannot give."""
    from flink_template_spark.plans.datapipe import (
        _Z_BITS,
        _Z_PARTS_SHIFT,
        _Z_PRICE_BUCKET,
    )
    from flink_template_spark.functions.zorder import morton_interleave
    from flink_template_spark.tables import load_table

    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    qx = F.floor(F.col("l_extendedprice") / F.lit(_Z_PRICE_BUCKET))
    qy = F.floor(F.col("l_quantity")) - F.lit(1)
    zkey = morton_interleave(qx, qy, _Z_BITS)
    tile = 1 << (_Z_BITS - (2 * _Z_BITS - _Z_PARTS_SHIFT) // 2)  # 16
    rows = (
        li.select(
            F.shiftright(zkey, _Z_PARTS_SHIFT).alias("pid"),
            qx.alias("qx"),
            qy.alias("qy"),
        )
        .groupBy("pid")
        .agg(
            F.min("qx").alias("x0"), F.max("qx").alias("x1"),
            F.min("qy").alias("y0"), F.max("qy").alias("y1"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # aligned: both corners in the same tile-width window
        assert r["x0"] // tile == r["x1"] // tile, r
        assert r["y0"] // tile == r["y1"] // tile, r


def test_ewma_matches_python_reference(spark, monkeypatch):
    """EWMA fold vs a pure-Python left-assoc replay on a hand series,
    including the start-of-series rows where the normalizer sums only
    the PRESENT lags' weights (the truncated-window correction)."""
    import datetime

    import flink_template_spark.plans.events_time as ET

    vals = [3.0, 1.5, 4.25, 2.0, 8.5, 0.25, 7.75, 5.5]
    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            ("a", base + datetime.timedelta(minutes=i), i, v)
            for i, v in enumerate(vals)
        ],
        "event_type string, ts timestamp, event_id long, value double",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    monkeypatch.setattr(ET, "_EWMA_SAMPLE", 1)
    got = {
        r["rn"]: r["ewma"] for r in ET.q_ewma_value(spark, "unused").collect()
    }

    def ref(t):
        num = den = None
        for j, w in enumerate(ET._EWMA_WEIGHTS):
            x = vals[t - j] if t - j >= 0 else None
            nt = w * x if x is not None else 0.0
            dt = w if x is not None else 0.0
            num = nt if num is None else num + nt
            den = dt if den is None else den + dt
        return num / den

    assert got == {t + 1: ref(t) for t in range(len(vals))}
    # smoothing sanity: the smoothed series varies less than the raw one
    raw_span = max(vals) - min(vals)
    sm = list(got.values())
    assert max(sm) - min(sm) < raw_span


def test_ewma_all_null_window_is_null_not_abort(spark, monkeypatch):
    """A partition whose first rows have only NULL values has a 0.0
    normalizer: the smoothed value must be NULL (mirrored by the
    oracle's CASE), not an ANSI-mode DIVIDE_BY_ZERO job abort."""
    import datetime

    import flink_template_spark.plans.events_time as ET

    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base, 0, None), ("a", base + datetime.timedelta(minutes=1), 1, 4.0)]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    monkeypatch.setattr(ET, "_EWMA_SAMPLE", 1)
    got = {r["rn"]: r["ewma"] for r in ET.q_ewma_value(spark, "unused").collect()}
    assert got[1] is None  # all-NULL window -> NULL, no abort
    assert got[2] == 4.0  # NULL lag contributes nothing; lone value passes through


def test_curriculum_order_interleaves_and_ascends(spark, monkeypatch):
    """The two properties the ordering buys: consecutive positions
    rotate across sources (round-robin — no source runs longer than
    the source count while all sources still have docs), and within
    each source positions follow ascending difficulty."""
    import flink_template_spark.plans.datapipe as DP

    rows = [
        (i, f"src{i % 3}", 100 + i) for i in range(30)
    ]  # 3 sources x 10 docs, difficulty strictly increasing with id
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    monkeypatch.setattr(DP, "load_table", lambda s, sd, t: docs)
    monkeypatch.setattr(DP, "_CURRICULUM_SAMPLE", 1)
    out = sorted(
        (r["pos"], r["source"], r["n_chars"])
        for r in DP.q_curriculum_order(spark, "unused").collect()
    )
    assert len(out) == 30
    # round-robin: positions 1..3 hit three distinct sources, etc.
    for block in range(10):
        srcs = {s for _, s, _ in out[block * 3 : block * 3 + 3]}
        assert len(srcs) == 3, out[block * 3 : block * 3 + 3]
    # within each source, difficulty ascends with position
    per_src: dict = {}
    for pos, s, nc in out:
        per_src.setdefault(s, []).append(nc)
    for s, ncs in per_src.items():
        assert ncs == sorted(ncs)


def test_robust_fence_median_mad_reference(spark, monkeypatch):
    """Median/MAD selection on hand data covering odd and even group
    sizes, plus a gross outlier the 3-MAD fence must catch while the
    median ignores it (the breakdown-point property mean/std lacks)."""
    import flink_template_spark.plans.quality as Q

    rows = (
        [(i, "odd", v) for i, v in enumerate([10, 20, 30, 40, 1000])]
        + [(10 + i, "even", v) for i, v in enumerate([10, 20, 30, 41])]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {
        r["lang"]: r
        for r in Q.q_robust_outlier_fence(spark, "unused").collect()
    }
    # odd group: median 30 (unmoved by the 1000 outlier); deviations
    # {0,10,20,10,970} -> MAD 10; fence 30: only 1000 is out
    assert got["odd"]["med"] == 30.0
    assert got["odd"]["mad"] == 10.0
    assert got["odd"]["n_outliers"] == 1
    # even group: median (20+30)/2 = 25; deviations {15,5,5,16} ->
    # sorted {5,5,15,16} -> MAD (5+15)/2 = 10; fence 30: none out
    assert got["even"]["med"] == 25.0
    assert got["even"]["mad"] == 10.0
    assert got["even"]["n_outliers"] == 0


def test_bigram_gate_penalizes_shuffled_text(spark, monkeypatch):
    """The property the conditional model adds over the unigram gate:
    a document whose TOKENS are all common but whose TRANSITIONS are
    scrambled scores strictly lower than the naturally-ordered
    documents that trained the counts."""
    import flink_template_spark.plans.quality as Q

    natural = "the quick brown fox jumps over the lazy dog"
    rows = [(i, natural) for i in range(8)] + [
        (8, "dog the over quick lazy brown the jumps fox")  # same tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in Q.q_bigram_logprob(spark, "unused").collect()
    }
    assert got[8] < got[0], got
    # natural copies all share the (high) score of the dominant chains
    assert len({got[i] for i in range(8)}) == 1


def test_token_entropy_reference_and_boilerplate(spark, monkeypatch):
    """Hand-checkable entropies: a uniform 4-word doc hits exactly
    2 bits (its maximum -> keep), a doc cycling one word hits 0 bits
    (boilerplate -> drop), and a skewed doc lands strictly between
    with keep driven by the 70%-of-max rule."""
    import math

    import flink_template_spark.plans.quality as Q

    rows = [
        (0, "a b c d"),  # uniform: H = 2.0 bits = log2(4) -> keep
        (1, "spam spam spam spam spam"),  # H = 0 -> drop (max 0 tho: n_distinct 1 -> keep by convention)
        (2, "a a a a a a b"),  # skewed 2-word: H ~ 0.59 < 0.7*1 -> drop
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["doc_id"]: r for r in Q.q_token_entropy(spark, "unused").collect()}
    assert got[0]["entropy_bits"] == 2.0 and got[0]["keep"]
    assert got[1]["entropy_bits"] == 0.0
    assert got[1]["keep"]  # single-word vocab: max entropy 0, trivially kept
    h2 = got[2]["entropy_bits"]
    expect = 6 / 7 * math.log2(7 / 6) + 1 / 7 * math.log2(7)
    assert abs(h2 - expect) < 1e-6
    assert not got[2]["keep"]  # 0.59 bits < 0.7 * log2(2)


def test_quantile_normalize_calibrates_shifted_sources(spark, monkeypatch):
    """The calibration property: source B's scores are source A's
    shifted by +1000, so raw thresholds mean different things per
    source — but after quantile normalization, the doc at the same
    local rank in A and B maps to the SAME global value."""
    import flink_template_spark.plans.quality as Q

    a = [(i, "A", 100 + i) for i in range(50)]
    b = [(100 + i, "B", 1100 + i) for i in range(50)]
    docs = spark.createDataFrame(a + b, "doc_id long, source string, n_chars long")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    monkeypatch.setattr(Q, "_QNORM_SAMPLE", 5)
    got = Q.q_quantile_normalize(spark, "unused").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["norm_score"])
    # same local ranks sampled in both sources -> identical normalized
    # scores, despite the +1000 raw shift
    assert by_src["A"] == by_src["B"]
    # and the normalized scores span the GLOBAL distribution (values
    # from both halves appear)
    assert min(by_src["A"]) < 1100 <= max(by_src["A"])


def test_dsir_weights_prefer_target_like_docs(spark, monkeypatch):
    """DSIR semantics: documents sharing the TARGET slice's vocabulary
    get positive importance (keep=True); documents built from vocab the
    target never uses score negative. A doc mixing both lands between
    the extremes. Weights come from the corpus itself, so the non-'en'
    doc that USES target vocabulary still keeps — DSIR scores content,
    not the lang label."""
    import flink_template_spark.plans.quality as Q

    tgt = "alpha beta gamma delta alpha beta gamma delta"
    offtgt = "uno dos tres cuatro uno dos tres cuatro"
    # 50 copies per slice so real counts dominate the +1/+B Laplace
    # smoothing (with token totals ~ B the smoothing denominators would
    # drag every weight negative regardless of content)
    rows = (
        [(i, tgt, "en") for i in range(50)]
        + [(50 + i, offtgt, "es") for i in range(50)]
        + [
            (100, tgt, "fr"),  # target-like content, non-target label
            (101, "alpha beta uno dos", "es"),  # half and half
        ]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {
        r["doc_id"]: (r["score_q"], r["keep"])
        for r in Q.q_dsir_weights(spark, "unused").collect()
    }
    assert got[0][1] is True and got[50][1] is False
    assert got[100] == got[0]  # content-scored, label-blind at scoring time
    assert got[50][0] < got[101][0] < got[0][0]
    # per-token consistency: identical docs share identical scores
    assert got[0] == got[1] == got[2]


def test_bootstrap_ci_brackets_the_mean_and_reacts_to_spread(spark, monkeypatch):
    """The percentile CI must bracket the full-sample mean, be wider for
    a high-variance group than a (nearly) constant one, and collapse to
    ~zero width when every value is identical."""
    import random

    import flink_template_spark.plans.functions_ext as FE

    rng = random.Random(11)
    rows = []
    k = 0
    for _ in range(400):  # tight group: constant price
        rows.append((k, "tight", 100.0)); k += 1
    for _ in range(400):  # wide group: heavy spread
        rows.append((k, "wide", round(rng.uniform(10.0, 1000.0), 2))); k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    monkeypatch.setattr(FE, "load_table", lambda s, sd, t: orders)
    got = {
        r["o_orderpriority"]: r
        for r in FE.q_bootstrap_ci(spark, "unused").collect()
    }
    t, w = got["tight"], got["wide"]
    assert t["ci_lo"] <= t["mean_price"] <= t["ci_hi"]
    assert w["ci_lo"] <= w["mean_price"] <= w["ci_hi"]
    assert t["mean_price"] == 100.0
    assert (t["ci_hi"] - t["ci_lo"]) == 0.0  # constant data -> zero width
    assert (w["ci_hi"] - w["ci_lo"]) > 1.0   # spread -> visible interval
    assert t["n_replicas"] == w["n_replicas"] == 32


def test_stupid_backoff_penalizes_unseen_transitions(spark, monkeypatch):
    """The frozen-model property the self-scoring bigram gate lacks:
    a held-out doc (ids 8/16 hash to non-train splits) made of train
    vocabulary in UNSEEN transitions scores every position through the
    0.4-weighted unigram backoff and lands strictly below an in-model
    doc; a held-out doc with fully OOV vocabulary scores lower still."""
    import flink_template_spark.plans.quality as Q

    natural = "the quick brown fox jumps over the lazy dog"
    rows = [(i, natural) for i in range(8)]  # ids 0-7 hash to train
    rows.append((8, "dog the over quick lazy brown the jumps fox"))  # held out
    rows.append((16, "zyx wvu tsr qpo nml kji hgf edc ba"))  # held out, OOV
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["doc_id"]: r for r in Q.q_stupid_backoff(spark, "unused").collect()}
    # in-model docs: zero backoff, shared score
    assert got[0]["n_backoff"] == 0
    assert got[0]["avg_logprob"] == got[1]["avg_logprob"]
    # scrambled held-out doc: every transition unseen -> all backoff
    assert got[8]["n_backoff"] == got[8]["n_bigrams"]
    assert got[8]["avg_logprob"] < got[0]["avg_logprob"]
    # OOV held-out doc: all backoff AND the floor unigram -> lowest
    assert got[16]["n_backoff"] == got[16]["n_bigrams"]
    assert got[16]["avg_logprob"] < got[8]["avg_logprob"]


def test_systematic_resample_total_is_exactly_m(spark, sf_dir):
    """Telescoping invariant: multiplicities sum to exactly M picks,
    and every picked document's weight interval genuinely straddles at
    least one stride boundary (n_copies >= 1)."""
    import flink_template_spark.plans.datapipe as DP

    out = DP.q_systematic_resample(spark, sf_dir).collect()
    assert sum(r["n_copies"] for r in out) == DP._RESAMPLE_M
    assert all(r["n_copies"] >= 1 for r in out)


def test_global_prefix_sum_matches_serial(spark):
    """with_global_prefix_sum over a forced multi-partition range
    exchange equals the serial cumulative sum, including duplicate
    order keys disambiguated by the tiebreak."""
    from pyspark.sql import functions as F

    from flink_template_spark.operators.rank_global import (
        with_global_prefix_sum,
    )

    df = spark.range(5000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("tb"),
        ((F.col("id") * 7) % 13 + 1).alias("w"),
    )
    out = with_global_prefix_sum(
        df, [("k", True), ("tb", True)], "w", out_col="cum", num_partitions=11
    ).collect()
    got = {(r["k"], r["tb"]): r["cum"] for r in out}
    acc = 0
    for k, tb, w in sorted(
        (r["k"], r["tb"], r["w"]) for r in df.collect()
    ):
        acc += w
        assert got[(k, tb)] == acc
