"""Behavioral pins for the round-6 second-wave operators — properties
the corpus oracle can't see (axioms, planted structures, extremes)."""

from __future__ import annotations


def test_knn_shapley_efficiency_axiom(spark, monkeypatch):
    """Shapley efficiency: the values over ALL training points sum to
    the full-set utility v(N) = (1/K) * sum_{j<=K} 1[y_(j) = y_q],
    averaged over test points (Jia et al. closed form). Checked on a
    synthetic set small enough that the top-20 cut returns everything,
    up to the 1e-15 fixed-point floor per term."""
    import flink_template_spark.plans.vectors as V

    # 2 test points (vec_id 0, 1), 10 train points; 1-d embeddings so
    # distances are transparent. label = parity.
    rows = []
    for vid in range(2):
        rows.append((vid, [float(vid), 1.0], vid % 2))
    for i in range(10):
        rows.append((8 + i, [float(i) / 10.0, 1.0], i % 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(V, "load_table", lambda s, sd, t: emb)

    got = {r["vec_id"]: r["shapley"] for r in V.q_knn_shapley(spark, "x").collect()}
    assert len(got) == 10  # top-20 cut returned every train point

    # reference utility per test point: rank train by true cosine desc
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    k = V._SHAP_K
    total_v = 0.0
    for vid in range(2):
        q = [float(vid), 1.0]
        y_q = vid % 2
        ranked = sorted(
            ((round(cos([float(i) / 10.0, 1.0], q), 6), -(8 + i), i % 2)
             for i in range(10)),
            reverse=True,
        )
        total_v += sum(1 for _, _, y in ranked[:k] if y == y_q) / k
    want = total_v / 2  # mean over the 2 test points
    assert abs(sum(got.values()) - want) < 1e-6


def test_containment_finds_what_jaccard_misses(spark, monkeypatch):
    """A small doc pasted verbatim into a much larger one: containment
    C(small -> big) = 1.0 while Jaccard is far below any usable
    threshold — the asymmetric detector's whole reason to exist."""
    import flink_template_spark.plans.text_dedup as TD
    from flink_template_spark.operators.dedup import (
        containment_prefix_pairs,
        jaccard_prefix_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    big = filler + " " + small + " " + " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated words only here now")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_prefix_pairs(docs, t_num=4, t_den=5, n=4).collect()
    }
    assert got[(1, 2)] == 1.0  # small fully contained in big
    assert (2, 1) not in got  # big is NOT contained in small
    assert (1, 3) not in got and (3, 1) not in got
    # symmetric Jaccard at the same 0.8 bar sees nothing
    jac = jaccard_prefix_pairs(docs, t_num=4, t_den=5, n=4).collect()
    assert not [r for r in jac if {r["id_a"], r["id_b"]} == {1, 2}]


def test_line_dedup_strips_boilerplate_keeps_first(spark, monkeypatch):
    """A footer block shared by every doc survives only in the
    globally-first occurrence (min doc_id, then min position); unique
    content is untouched."""
    import flink_template_spark.plans.text_dedup as TD

    footer = " ".join(f"f{i}" for i in range(TD.SEG_W))  # one exact segment
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(TD.SEG_W)) + " " + footer),
            (2, " ".join(f"b{i}" for i in range(TD.SEG_W)) + " " + footer),
            (3, footer),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(TD, "load_table", lambda s, sd, t: docs)
    got = {r["doc_id"]: r for r in TD.q_line_dedup_corpus(spark, "x").collect()}
    assert got[1]["n_removed"] == 0  # first occurrence of the footer wins
    assert footer in got[1]["kept_text"]
    assert got[2]["n_removed"] == 1 and footer not in got[2]["kept_text"]
    assert got[3]["n_removed"] == 1 and got[3]["kept_text"] == ""


def test_hellinger_extremes(spark, monkeypatch):
    """Identical word distributions -> ~0; disjoint vocabularies ->
    near the H^2 upper bound (1 - smoothing floor)."""
    import flink_template_spark.plans.quality as Q

    # heavy sources so the +1/256-bucket Laplace smoothing mass is
    # small relative to the real distribution (tiny sources would look
    # mutually similar through the smoothing floor alone)
    same = "tok1 tok2 tok3 tok4 " * 500
    docs = spark.createDataFrame(
        [
            (1, same, "a"),
            (2, same, "b"),
            (3, "completely different words here " * 500, "c"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {
        (r["source_a"], r["source_b"]): r["hellinger_sq"]
        for r in Q.q_hellinger_affinity_matrix(spark, "x").collect()
    }
    assert got[("a", "b")] < 0.001  # identical distributions
    assert got[("a", "c")] > 0.5  # disjoint vocab, far apart
    assert got[("a", "c")] == got[("b", "c")]  # symmetry via identical dists


def test_matryoshka_prefix_identical_vectors_full_overlap(spark, monkeypatch):
    """When every vector's information lives entirely in the first 8
    dims (the rest exactly zero — a constant NONZERO tail would shift
    per-vector norms and legitimately reorder the full ranking),
    every truncation tier reproduces the full ranking exactly —
    overlap 1.0 for all queries and dims."""
    import flink_template_spark.plans.vectors as V

    rows = []
    for i in range(24):
        head = [float((i * j) % 7 + 1) for j in range(8)]
        rows.append((i, head + [0.0] * 56, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(V, "load_table", lambda s, sd, t: emb)
    out = V.q_matryoshka_overlap(spark, "x").collect()
    assert len(out) == len(V._MATRYOSHKA_DIMS) * V._RECALL_NQ
    low = [r for r in out if r["overlap_frac"] < 1.0]
    # dims 16/32 include the constant tail; dim 8 is the pure head —
    # all three must reproduce the full-vector ranking here
    assert not low, low


def test_phrase_search_counts_and_positions(spark, monkeypatch):
    """Hand-checkable phrase occurrences: overlapping matches count
    per starting position, first_pos is the earliest."""
    import flink_template_spark.plans.text_dedup as TD

    docs = spark.createDataFrame(
        [
            (1, "table table table fast key scan"),
            (2, "fast key scan fast key scan"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(TD, "load_table", lambda s, sd, t: docs)
    got = {
        (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in TD.q_phrase_search(spark, "x").collect()
    }
    # "table table" at positions 0 and 1 (overlapping) in doc 1
    assert got[("table table", 1)] == (2, 0)
    assert got[("fast key scan", 1)] == (1, 3)
    assert got[("fast key scan", 2)] == (2, 0)
    assert ("fast key scan", 3) not in got


def test_systematic_resample_proportionality(spark, monkeypatch):
    """A document holding half the total weight receives ~half the
    picks (floor/ceil of M/2); zero-weight neighbors are never picked."""
    import flink_template_spark.plans.datapipe as DP

    m = DP._RESAMPLE_M
    rows = [(1, 500), (2, 100), (3, 100), (4, 100), (5, 100), (6, 100)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    monkeypatch.setattr(DP, "load_table", lambda s, sd, t: docs)
    got = {r["doc_id"]: r["n_copies"] for r in DP.q_systematic_resample(spark, "x").collect()}
    assert sum(got.values()) == m
    assert got[1] == m // 2  # exactly proportional on exact halves
    for d in (2, 3, 4, 5, 6):
        assert got[d] == m // 10


def test_auc_extremes_and_ties(spark, monkeypatch):
    """Perfect score separation -> AUC 1.0 (or 0.0 reversed); an
    all-tied score -> exactly 0.5 via midranks; single-class sources
    are excluded."""
    import flink_template_spark.plans.quality as Q

    rows = []
    # source 'sep': every en doc longer than every other doc
    for i in range(10):
        rows.append((i, "en" if i < 5 else "de", 1000 + i if i < 5 else i, "sep"))
    # source 'tie': all scores equal, both classes present
    for i in range(10):
        rows.append((100 + i, "en" if i % 2 == 0 else "de", 42, "tie"))
    # source 'mono': only one class -> must be excluded
    for i in range(4):
        rows.append((200 + i, "en", i, "mono"))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, source string"
    )
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["source"]: r for r in Q.q_auc_lang_confound(spark, "x").collect()}
    assert got["sep"]["auc"] == 1.0
    assert got["tie"]["auc"] == 0.5
    assert "mono" not in got


def test_ks_drift_flags_shifted_source(spark, monkeypatch):
    """A source whose n_chars distribution is shifted far from the
    rest carries a near-1 KS statistic; a source drawn identically to
    the rest stays small."""
    import flink_template_spark.plans.quality as Q

    # the drifted source is SMALL relative to the corpus so "rest of
    # corpus" still approximates the in-family distribution for a and b
    # (a large drifted source legitimately raises everyone's KS — the
    # statistic is source-vs-rest, not source-vs-family)
    rows = []
    for i in range(200):
        rows.append((i, "a", 100 + (i % 20)))          # in-family
        rows.append((1000 + i, "b", 100 + ((i * 7) % 20)))  # same family
    for i in range(20):
        rows.append((2000 + i, "c", 900 + (i % 20)))   # shifted +800
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["source"]: r["ks_stat"] for r in Q.q_ks_source_drift(spark, "x").collect()}
    assert got["c"] == 1.0  # disjoint support: maximal drift
    assert got["a"] < 0.2 and got["b"] < 0.2


def test_content_fingerprint_sensitivity(spark, monkeypatch):
    """One changed byte in one row flips the XOR fingerprint; a
    DUPLICATED row pair — invisible to XOR (x^x=0) — is caught by the
    count and SUM riders. That duplication blindness is exactly why
    the riders travel with the XOR."""
    import flink_template_spark.plans.functions_ext as FE

    base = [(i, "en", 10 + i, f"text {i}", "s") for i in range(50)]

    def fp(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, n_chars long, text string, source string"
        )
        monkeypatch.setattr(FE, "load_table", lambda s, sd, t: df)
        r = FE.q_content_fingerprint(spark, "x").collect()[0]
        return (r["n_rows"], r["xor_fp"], r["sum_fp"])

    clean = fp(base)
    flipped = fp([(i, "en", 10 + i, ("TEXT 7" if i == 7 else f"text {i}"), "s") for i in range(50)])
    assert flipped[1] != clean[1]  # xor catches a single-row change

    dup_pair = fp(base + [base[3], base[3]])  # same row twice more
    assert dup_pair[1] == clean[1]  # XOR alone is blind to the pair
    assert dup_pair[0] != clean[0]  # ...but the count rider is not
    assert dup_pair[2] != clean[2]  # ...and neither is the sum rider

    # NULL fields must still fingerprint (a naive '||' concat hashes
    # to NULL and the row vanishes from every aggregate): two tables
    # whose NULL-text rows differ must disagree
    null_a = fp(base[:-1] + [(49, "en", 59, None, "s")])
    null_b = fp(base[:-1] + [(999, "de", 1, None, "s")])
    assert null_a[0] == null_b[0] == clean[0]  # same row counts
    assert null_a[1] != null_b[1]  # xor sees through the NULL field


def test_fp_serial_injective_on_pipe_bearing_lang(spark, monkeypatch):
    """ADVICE r6: serialization injectivity must survive a '|' inside
    the interior free-text field. Under the unprefixed scheme,
    (1,'en|v7',8,'T') and (1,'en',7,'8|vT') concatenated to the SAME
    string (the '|' in lang forged the lang/n_chars boundary), so both
    engines fingerprinted two different tables identically — the exact
    corruption the query exists to catch. The length prefix on lang
    makes boundaries parseable for any content; pin the forged pair
    apart, in Spark AND in the DuckDB oracle side."""
    import duckdb

    import flink_template_spark.plans.functions_ext as FE

    def fp(row):
        df = spark.createDataFrame(
            [row], "doc_id long, lang string, n_chars long, text string, source string"
        )
        monkeypatch.setattr(FE, "load_table", lambda s, sd, t: df)
        r = FE.q_content_fingerprint(spark, "x").collect()[0]
        return (r["xor_fp"], r["sum_fp"])

    forged_a = (1, "en|v7", 8, "T", "s")
    forged_b = (1, "en", 7, "8|vT", "s")
    assert fp(forged_a) != fp(forged_b)

    # the oracle side serializes identically (cross-engine parity on
    # the adversarial rows, not just the corpus)
    con = duckdb.connect()
    expr = FE._fp_serial("VARCHAR")
    ha = con.execute(
        f"SELECT md5({expr}) FROM (SELECT 1 AS doc_id, 'en|v7' AS lang,"
        " 8 AS n_chars, 'T' AS text)"
    ).fetchone()[0]
    hb = con.execute(
        f"SELECT md5({expr}) FROM (SELECT 1 AS doc_id, 'en' AS lang,"
        " 7 AS n_chars, '8|vT' AS text)"
    ).fetchone()[0]
    assert ha != hb


def test_line_dedup_rejects_out_of_range_doc_id(spark, monkeypatch):
    """ADVICE r6: the packed dedup key is order-preserving only for
    0 <= doc_id < 2^31; a larger id used to alias/overflow SILENTLY and
    corrupt which occurrence wins MIN. The guard must fail the job
    loudly instead — and leave in-range corpora untouched."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    import flink_template_spark.plans.text_dedup as TD

    def run(doc_ids):
        df = spark.createDataFrame(
            [(i, "a b c d e f g h a b") for i in doc_ids],
            "doc_id long, text string",
        )
        monkeypatch.setattr(TD, "load_table", lambda s, sd, t: df)
        return TD.q_line_dedup_corpus(spark, "x").collect()

    ok = run([1, 2])
    assert [r["doc_id"] for r in ok] == [1, 2]
    assert ok[1]["n_removed"] == 2  # doc 2's both segments are dups of doc 1

    with pytest.raises(SparkRuntimeException, match="doc_id out of key range"):
        run([1, 1 << 31])
    with pytest.raises(SparkRuntimeException, match="doc_id out of key range"):
        run([-5])


def test_labelprop_two_cliques_converge_to_two_communities(spark, monkeypatch):
    """Two 4-cliques joined by one bridge edge resolve to exactly two
    communities, each labeled by its clique's minimum node id."""
    import flink_template_spark.plans.graph as G
    from pyspark.sql import functions as F

    c1 = [(a, b) for a in range(4) for b in range(4) if a != b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "src int, dst int")
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "n_nationkey int"
    )
    monkeypatch.setattr(G, "_trade_edges", lambda s, sd: edges)
    monkeypatch.setattr(
        G, "load_table", lambda s, sd, t: nodes
    )
    got = {r["community"]: r for r in G.q_labelprop_communities(spark, "x").collect()}
    assert set(got) == {0, 10}
    assert got[0]["n_members"] == 4 and got[10]["n_members"] == 4


def _ev_rows(spec):
    """spec: {event_type: [day0_count, day1_count, ...]} -> event rows."""
    rows = []
    eid = 0
    for et, counts in spec.items():
        for day, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (eid, f"2024-01-{day + 1:02d}T12:00:00", 1, et, 1.0, "{}")
                )
                eid += 1
    return rows


def _ev_df(spark, spec):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        _ev_rows(spec),
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_burstiness_extremes(spark, monkeypatch):
    """Constant daily volume -> Fano exactly 0; a bursty series
    (all mass on one day) -> Fano >> 1."""
    import flink_template_spark.plans.events_time as ET

    ev = _ev_df(
        spark,
        {"flat": [5, 5, 5, 5], "bursty": [20, 1, 1, 1]},
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    got = {r["event_type"]: r for r in ET.q_event_burstiness(spark, "x").collect()}
    assert got["flat"]["fano"] == 0.0
    # bursty: mean 5.75, var ((20-5.75)^2+3*(1-5.75)^2)/3 = 90.25
    assert got["bursty"]["fano"] > 10


def test_correlation_matrix_extremes(spark, monkeypatch):
    """Identical series -> r = 1; mirrored series -> r = -1; the grid
    zero-fills days a type never fired on."""
    import flink_template_spark.plans.events_time as ET

    ev = _ev_df(
        spark,
        {"a": [1, 2, 3, 4], "b": [1, 2, 3, 4], "c": [4, 3, 2, 1]},
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    got = {
        (r["type_a"], r["type_b"]): r["pearson_r"]
        for r in ET.q_event_correlation_matrix(spark, "x").collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0


def test_theil_sen_ignores_outlier_day(spark, monkeypatch):
    """A clean +2/day linear series keeps slope exactly 2.0 even with
    one wild outlier day injected — the estimator's whole point; OLS
    on the same data would be far off."""
    import flink_template_spark.plans.events_time as ET

    clean = [2, 4, 6, 8, 10, 12, 14]
    spiked = list(clean)
    spiked[3] = 200  # one corrupted day
    ev = _ev_df(spark, {"clean": clean, "spiked": spiked})
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    got = {r["event_type"]: r["ts_slope"] for r in ET.q_theil_sen_trend(spark, "x").collect()}
    assert got["clean"] == 2.0
    assert got["spiked"] == 2.0  # median of pairwise slopes shrugs it off


def test_wilson_interval_contains_rate_and_respects_volume(spark, monkeypatch):
    """The Wilson interval brackets the observed rate, stays inside
    [0, 1] even at extreme rates, and shrinks with volume."""
    import flink_template_spark.plans.quality as Q

    long_txt = " ".join(["w"] * 100)
    short_txt = "w w"
    rows = []
    # small source: 3/4 pass; big source: 300/400 pass; all-pass source
    for i in range(4):
        rows.append((i, "en", 1, long_txt if i < 3 else short_txt, "small"))
    for i in range(400):
        rows.append((100 + i, "en", 1, long_txt if i < 300 else short_txt, "big"))
    for i in range(50):
        rows.append((1000 + i, "en", 1, long_txt, "allpass"))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string, source string"
    )
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["source"]: r for r in Q.q_gate_rates_wilson(spark, "x").collect()}
    for src in ("small", "big", "allpass"):
        r = got[src]
        assert 0.0 <= r["wilson_lo"] <= r["pass_rate"] <= r["wilson_hi"] <= 1.0
    # same rate, 100x volume -> much tighter interval
    w_small = got["small"]["wilson_hi"] - got["small"]["wilson_lo"]
    w_big = got["big"]["wilson_hi"] - got["big"]["wilson_lo"]
    assert w_big < w_small / 5
    assert got["allpass"]["wilson_hi"] == 1.0 and got["allpass"]["wilson_lo"] > 0.9
