"""Behavioral pins for the round-7 additions — properties the corpus
oracle can't see (axioms, planted structures, extremes)."""

from __future__ import annotations


def test_cdc_boundaries_survive_prefix_insertion(spark, monkeypatch):
    """The content-defined property itself: prepend tokens to a shared
    passage and the passage's chunks still dedup (boundaries re-anchor
    on content), which fixed-stride segmentation cannot do. Doc 1 and
    doc 2 share a long tail; doc 2 has an extra prefix. Everything
    after doc 2's first re-synchronized boundary must dedup against
    doc 1, so doc 2 stores strictly less than its full length."""
    import flink_template_spark.plans.text_dedup as TD

    shared = " ".join(f"tok{i % 97}x{(i * 7) % 89}" for i in range(400))
    docs = spark.createDataFrame(
        [
            (1, shared, "a"),
            (2, "zz1 zz2 zz3 " + shared, "b"),
            (3, " ".join(f"uniq{i}" for i in range(50)), "c"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(TD, "load_table", lambda s, sd, t: docs)
    got = {r["source"]: r for r in TD.q_cdc_chunk_dedup(spark, "x").collect()}
    # doc 1 is globally first: stores everything
    assert got["a"]["store_ratio"] == 1.0
    # doc 2: most chars dedup against doc 1 despite the shifted prefix
    assert got["b"]["store_ratio"] < 0.25, got["b"]
    # unshared content is untouched
    assert got["c"]["store_ratio"] == 1.0


def test_cdc_chunks_partition_each_document(spark, monkeypatch):
    """Chunking is a partition: per source, total chunk characters
    reassemble the documents exactly (sum of chunk lengths = doc chars
    + one separator per chunk gap)."""
    import flink_template_spark.plans.text_dedup as TD
    from pyspark.sql import functions as F

    texts = {
        1: " ".join(f"w{i * 13 % 101}" for i in range(123)),
        2: "single",
        3: "a b",
    }
    docs = spark.createDataFrame(
        [(k, v, f"s{k}") for k, v in texts.items()],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(TD, "load_table", lambda s, sd, t: docs)
    got = {r["source"]: r for r in TD.q_cdc_chunk_dedup(spark, "x").collect()}
    for k, text in texts.items():
        r = got[f"s{k}"]
        # n_chunks-1 separators are not stored inside chunk texts
        assert r["chars_total"] == len(text) - (r["n_chunks"] - 1), (k, r)
        assert r["n_first"] == r["n_chunks"]  # no cross-doc dups planted


def test_bigram_lift_prefers_exclusive_pairs(spark, monkeypatch):
    """Axiom: a pair whose tokens appear ONLY together has lift
    N_uni²/(c1·c2·N_bi)·c12 maximal among its frequency class; a pair
    of two independently-common tokens has lift ≈ 1. Planted: 'aa bb'
    always adjacent and exclusive; 'xx'/'yy' common everywhere but
    paired only sometimes."""
    import flink_template_spark.plans.quality as Q

    rows = []
    # 20 docs of pure 'aa bb' exclusivity
    for i in range(20):
        rows.append((i, "aa bb", "s"))
    # 40 docs where xx and yy are common but mostly not adjacent
    for i in range(40):
        rows.append((100 + i, "xx pad1 yy pad2 xx pad3 yy", "s"))
    # a perfectly-exclusive pair below min support (2 < _LIFT_MIN_C12)
    for i in range(2):
        rows.append((200 + i, "rare1 rare2", "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {(r["w1"], r["w2"]): r["lift"] for r in Q.q_bigram_lift(spark, "x").collect()}
    assert ("aa", "bb") in got
    lift_ab = got[("aa", "bb")]
    # every other surviving pair is weaker than the exclusive pair
    assert all(v <= lift_ab for v in got.values())
    # min-support: even a maximally-exclusive pair below support is out
    assert ("rare1", "rare2") not in got


def test_vocab_coverage_monotone_and_exact_on_zipf(spark, monkeypatch):
    """Coverage is monotone in k and exact on a hand-built frequency
    table: 1 type with 1000 tokens + 999 types with 1 token each →
    top-100 covers (1000+99)/1999."""
    import flink_template_spark.plans.quality as Q

    rows = [(0, " ".join(["hot"] * 1000), "s")]
    # 999 singleton types spread over a few docs
    singles = [f"t{i:04d}" for i in range(999)]
    for j in range(0, 999, 111):
        rows.append((j + 1, " ".join(singles[j : j + 111]), "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["k"]: r for r in Q.q_vocab_coverage(spark, "x").collect()}
    assert got[100]["covered"] == 1000 + 99
    assert got[100]["n_vocab"] == 100
    assert got[1000]["covered"] == 1999  # vocab exhausted at k=1000
    assert got[1000]["n_vocab"] == 1000
    assert got[10000]["n_vocab"] == 1000  # k past vocab size: clamps
    assert (
        got[100]["coverage"] <= got[1000]["coverage"] == got[10000]["coverage"] == 1.0
    )


def test_mrr_first_relevant_rank_axioms(spark, monkeypatch):
    """Planted geometry: query 0's nearest candidate shares its label
    (rr = 1); query 1's label never appears in its top-10 (rr = 0).
    1-d-style embeddings make ranks transparent."""
    import flink_template_spark.plans.vectors as V

    rows = []
    # queries: vec_id 0..7 (the _RECALL_NQ sample); only 0 and 1 matter
    # for the pins, the rest get far-away vectors
    rows.append((0, [1.0, 0.0], 0))
    rows.append((1, [0.0, 1.0], 9))  # label 9 exists nowhere else
    for vid in range(2, V._RECALL_NQ):
        rows.append((vid, [-1.0, -1.0], 5))
    # candidates: vec_id >= 8. c8 is nearest to q0 and label-matches.
    rows.append((8, [0.999, 0.01], 0))
    for i in range(30):
        rows.append((9 + i, [0.5 + i * 0.001, 0.5], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(V, "load_table", lambda s, sd, t: emb)
    got = {r["query_id"]: r for r in V.q_mrr_eval(spark, "x").collect()}
    assert len(got) == V._RECALL_NQ  # every query emits a row
    assert got[0]["first_rel_rank"] == 1 and got[0]["rr"] == 1.0
    assert got[1]["first_rel_rank"] == 0 and got[1]["rr"] == 0.0


def test_zonemap_sorted_layout_prunes_planted_quarter(spark, monkeypatch):
    """Planted uniform year of data: the range layout must make the
    one-quarter predicate skip MOST shards while the hash layout skips
    none (each hash shard spans the whole year)."""
    import datetime

    import flink_template_spark.plans.datapipe as D

    base = datetime.datetime(1996, 9, 1)
    rows = [
        (i, base + datetime.timedelta(hours=i)) for i in range(24 * 365)
    ]
    orders = spark.createDataFrame(rows, "o_orderkey long, o_orderdate timestamp")
    monkeypatch.setattr(D, "load_table", lambda s, sd, t: orders)
    got = {r["layout"]: r for r in D.q_shard_zonemap(spark, "x").collect()}
    assert got["hash"]["n_skippable"] == 0
    assert got["range"]["n_skippable"] >= D._ZM_SHARDS * 2 // 3
    assert got["range"]["rows_skipped"] > got["range"]["rows_total"] * 0.6
    # zone-map soundness: a skipped shard can contain NO matching row —
    # equivalently rows_skipped <= rows outside the predicate window
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1997, 4, 1)
    outside = sum(1 for _, d in rows if d < lo or d >= hi)
    assert got["range"]["rows_skipped"] <= outside


def test_mmr_penalizes_redundancy(spark, monkeypatch):
    """Planted: candidates form two tight near-duplicate groups plus
    singletons. Pure relevance ranking would take the top group's
    clones back-to-back; MMR must interleave — the second pick comes
    from OUTSIDE the first pick's clone group."""
    import math

    import flink_template_spark.plans.vectors as V

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    # Geometry chosen so the diversity term can actually flip a pick
    # under λ=0.7 (7·Δrel < 3·Δsim): group A at +0.2 rad (top
    # relevance, mutual sim ≈ 1), group B at −0.25 rad — nearly as
    # relevant but 0.45 rad from A, so after pick 1 the clone penalty
    # (3·~1e6) outweighs B's small relevance deficit.
    rows = [(V._MMR_QID, unit(0.0), 0)]
    for i in range(4):
        rows.append((10 + i, unit(0.2 + i * 0.001), 0))
    for i in range(4):
        rows.append((20 + i, unit(-0.25 - i * 0.001), 0))
    # filler to fill the pool
    for i in range(14):
        rows.append((30 + i, unit(1.4 + i * 0.01), 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(V, "load_table", lambda s, sd, t: emb)
    out = V.q_mmr_rerank(spark, "x").collect()
    assert [r["round"] for r in out] == [1, 2, 3, 4, 5]
    picks = [r["vec_id"] for r in out]
    assert picks[0] == 10  # most relevant overall
    assert picks[1] == 20, picks  # diversity beats the clone group
    # every round's objective uses the penalty actually in state
    for r in out:
        assert r["obj_q"] == 7 * r["rel_q"] - 3 * r["maxsim_q"]
    # rounds are distinct picks
    assert len(set(picks)) == 5


def test_lsh_recall_audit_deciles_and_exact_dups(spark, monkeypatch):
    """Planted structure: an exact duplicate pair (jaccard 1.0 → decile
    9, MUST be caught: identical shingle sets give identical minhash
    signatures, so every band matches) and a hand-built ~0.5 pair that
    lands in decile 5 and is counted once either way."""
    import flink_template_spark.plans.text_dedup as TD

    base = [f"t{i}" for i in range(20)]
    # doc 3 shares a 16-token prefix with doc 1: with 3-gram shingles,
    # inter = 14, sizes 18/18 -> j = 14/22 = 0.636 -> decile 6
    variant = base[:16] + [f"u{i}" for i in range(4)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(base)),
            (2, " ".join(base)),  # exact dup of 1
            (3, " ".join(variant)),
            (4, " ".join(f"z{i}" for i in range(20))),  # unrelated
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(TD, "load_table", lambda s, sd, t: docs)
    got = {r["j_decile"]: r for r in TD.q_lsh_recall_audit(spark, "x").collect()}
    assert got[9]["n_true"] == 1  # the exact pair
    assert got[9]["n_caught"] == 1 and got[9]["recall"] == 1.0
    # doc 3 pairs at 0.636 with BOTH exact dups 1 and 2
    assert got[6]["n_true"] == 2
    assert got[6]["n_caught"] in (0, 2)  # dup twins share signatures
    assert set(got) <= {5, 6, 7, 8, 9}  # nothing below the 0.5 threshold


def test_source_gini_extremes(spark, monkeypatch):
    """Axioms: perfectly balanced groups → gini 0; the hand-computable
    [1,1,1,97] split → exactly 0.72 (G = 2·Σi·x/(n·Σx) − (n+1)/n)."""
    import flink_template_spark.plans.quality as Q

    rows = []
    for i, (src, n) in enumerate([("a", 1), ("b", 1), ("c", 1), ("d", 97)]):
        for j in range(n):
            rows.append((i * 1000 + j, "w", "en", src))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    got = {r["dimension"]: r for r in Q.q_source_gini(spark, "x").collect()}
    assert got["source"]["n_groups"] == 4
    assert got["source"]["gini"] == 0.72
    # one lang -> n=1: G = 2·1·100/(1·100) − 2/1 = 0 (degenerate balanced)
    assert got["lang"]["gini"] == 0.0


def test_shuffle_skew_audit_conservation_and_hot_key(spark, monkeypatch):
    """Row conservation (Σ reducer rows = |table|) and a planted hot
    key: one key holding half the rows must push its reducer's
    load_ratio far above the uniform 1.0 while others stay below."""
    import flink_template_spark.plans.datapipe as D
    from pyspark.sql import functions as F

    rows = [(7,)] * 5000 + [(i,) for i in range(100, 5100)]
    li = spark.createDataFrame(rows, "l_orderkey long")
    monkeypatch.setattr(D, "load_table", lambda s, sd, t: li)
    out = D.q_shuffle_skew_audit(spark, "x").collect()
    assert sum(r["n_rows"] for r in out) == len(rows)
    ratios = sorted(r["load_ratio"] for r in out)
    assert ratios[-1] > 10.0  # the hot-key reducer
    assert ratios[-2] < 2.0  # everyone else near uniform
    # the hot reducer still counts its keys correctly (hot key is ONE key)
    hot = max(out, key=lambda r: r["load_ratio"])
    assert hot["n_rows"] >= 5000


def test_k_anonymity_planted_singleton(spark, monkeypatch):
    """Planted: one language where every doc shares a cell of size 6
    (no violations) and one language with a singleton cell — exactly
    that one doc is at risk; min_cell_size pins the audit's floor."""
    import flink_template_spark.plans.safety as S

    rows = []
    for i in range(6):  # en: one cell, size 6 >= k=5
        rows.append((i, "x", "en", "web", 100))
    for i in range(5):  # de: cell A size 5 (safe)...
        rows.append((10 + i, "x", "de", "web", 100))
    rows.append((20, "x", "de", "books", 100))  # ...plus a singleton
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(S, "load_table", lambda s, sd, t: docs)
    got = {r["lang"]: r for r in S.q_k_anonymity(spark, "x").collect()}
    assert got["en"]["n_cells_violating"] == 0
    assert got["en"]["n_docs_at_risk"] == 0 and got["en"]["frac_at_risk"] == 0.0
    assert got["de"]["n_cells"] == 2
    assert got["de"]["n_cells_violating"] == 1
    assert got["de"]["n_docs_at_risk"] == 1
    assert got["de"]["min_cell_size"] == 1


def test_seasonal_residuals_flag_planted_spike_only(spark, monkeypatch):
    """Planted perfectly-periodic weekly traffic (volume = f(weekday))
    with ONE spiked Monday: seasonal adjustment must flag exactly that
    day — a naive unadjusted z-score would flag every high-weekday
    day. Construction: 8 weeks, weekday volumes 10..70, one Monday
    gets +40."""
    import datetime

    import flink_template_spark.plans.events_time as ET

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)  # a Monday
    spike_day = 21  # day index of the spiked Monday (week 4)
    for d in range(56):
        vol = 10 * ((d % 7) + 1) + (40 if d == spike_day else 0)
        # tiny non-spike jitter so weekday variance is nonzero
        vol += d // 7 % 2
        day = base + datetime.timedelta(days=d)
        for _ in range(vol):
            rows.append((eid, day + datetime.timedelta(seconds=eid % 3600), 1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    out = ET.q_seasonal_residuals(spark, "x").collect()
    assert len(out) == 56  # every day emitted
    flagged = [r for r in out if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["day"] == (base + datetime.timedelta(days=spike_day)).date()
    assert flagged[0]["z"] > 2.0  # the spike is high, not low


def test_fd_audit_synthetic_hold_and_violation_mass(spark, monkeypatch):
    """Synthetic tables where each candidate's verdict is known by
    construction: keys hold with max_dependents 1; the planted
    violated FD reports exactly the planted violating-key count."""
    import flink_template_spark.plans.functions_ext as FE
    from pyspark.sql import functions as F

    orders = spark.createDataFrame(
        [(i, i % 10, "S" + str(i % 3 if i < 6 else 0), "P") for i in range(30)],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(i % 5, "R" if i % 2 else "N") for i in range(20)],
        "l_orderkey long, l_returnflag string",
    )
    customer = spark.createDataFrame(
        [(i, "SEG") for i in range(7)], "c_custkey long, c_mktsegment string"
    )
    docs = spark.createDataFrame(
        [(1, "web", "en"), (2, "web", "de"), (3, "books", "en")],
        "doc_id long, source string, lang string",
    )
    tables = {
        "orders": orders,
        "lineitem": lineitem,
        "customer": customer,
        "documents": docs,
    }
    monkeypatch.setattr(FE, "load_table", lambda s, sd, t: tables[t])
    got = {
        (r["table_name"], r["determinant"], r["dependent"]): r
        for r in FE.q_fd_audit(spark, "x").collect()
    }
    assert got[("orders", "o_orderkey", "o_orderstatus")]["fd_holds"]
    assert got[("customer", "c_custkey", "c_mktsegment")]["fd_holds"]
    # every 5-row l_orderkey group holds both R and N flags
    li = got[("lineitem", "l_orderkey", "l_returnflag")]
    assert not li["fd_holds"] and li["n_violating_keys"] == 5
    assert li["max_dependents"] == 2
    # web carries two langs, books one -> exactly one violating source
    dd = got[("documents", "source", "lang")]
    assert dd["n_violating_keys"] == 1 and not dd["fd_holds"]


def test_data_expectations_single_scan(spark, sf_dir):
    """The suite must evaluate ALL checks in one corpus pass: exactly
    one parquet scan in the plan (the per-check select loop
    re-expanded the aggregate subtree 6x), and a planted failing check
    must report its exact failure mass."""
    import contextlib
    import io
    import re

    from flink_template_spark import plans

    df = plans.QUERIES["q_data_expectations"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert len(re.findall(r"\(\d+\) Scan parquet", buf.getvalue())) == 1

    got = {r["check_name"]: r for r in df.collect()}
    assert set(got) == {n for n, _, _ in __import__(
        "flink_template_spark.plans.functions_ext", fromlist=["x"]
    )._EXPECTATIONS}
    # zero-tolerance checks: passed iff n_fail == 0 exactly
    for r in got.values():
        if r["n_fail"] == 0:
            assert r["passed"]
    # n_chars = length(text) is a real invariant of the testdata
    assert got["n_chars_matches_text"]["n_fail"] == 0


def test_snapshot_diff_classification_axioms(spark, monkeypatch):
    """Hand-built 4-doc corpus hitting every branch: one added (old
    drops %13==0... here planted directly), one removed, one changed
    (text truncation), one unchanged — counts must match the planted
    structure exactly, and 'changed' must trigger on the FINGERPRINT
    (an n_chars-only change counts)."""
    import flink_template_spark.plans.functions_ext as FE

    # doc_ids chosen for the derivation rules:
    #  17 -> dropped from NEW only => removed
    #  13 -> dropped from OLD only => added
    #  11 -> text truncated in OLD => changed
    #  1  -> untouched             => unchanged
    docs = spark.createDataFrame(
        [
            (17, "seventeen text here", "en", "s", 19),
            (13, "thirteen text here", "en", "s", 18),
            (11, "eleven text long enough to truncate", "en", "s", 36),
            (1, "one text", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(FE, "load_table", lambda s, sd, t: docs)
    r = FE.q_snapshot_diff(spark, "x").collect()
    assert len(r) == 1
    row = r[0]
    assert (
        row["n_added"],
        row["n_removed"],
        row["n_changed"],
        row["n_unchanged"],
    ) == (1, 1, 1, 1)


def test_benford_log_uniform_conforms_and_constant_leads_deviate(spark, monkeypatch):
    """Axioms: log-uniform amounts (the multiplicative process Benford
    models) deviate little from the reference; amounts engineered to
    all lead with digit 9 put ~95.4% of deviation mass on digits 9 and
    1 combined. Also pins integer digit extraction (no float log)."""
    import flink_template_spark.plans.functions_ext as FE

    rows = []
    # 2000 log-uniform amounts spanning 3 decades: near-Benford
    for i in range(2000):
        rows.append((i, "A", 10.0 ** (1 + 3 * i / 2000.0)))
    # 500 amounts all leading with 9
    for i in range(500):
        rows.append((10000 + i, "B", 9000.0 + i))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    monkeypatch.setattr(FE, "load_table", lambda s, sd, t: orders)
    out = FE.q_benford_audit(spark, "x").collect()
    dev = {}
    for r in out:
        dev.setdefault(r["o_orderpriority"], {})[r["digit"]] = r["abs_dev"]
    # log-uniform: every digit within a few points of reference
    assert max(dev["A"].values()) < 0.02, dev["A"]
    # all-9 leads: digit 9 observed at 1.0 vs 0.0458 reference
    assert dev["B"][9] > 0.9
    # the zero-observation digits are the loudest violations and MUST
    # appear (full spine, r7 review): each deviates by its whole
    # reference mass
    assert set(dev["B"]) == set(range(1, 10))
    b_rows = {r["digit"]: r for r in out if r["o_orderpriority"] == "B"}
    assert b_rows[1]["n_obs"] == 0
    assert abs(b_rows[1]["abs_dev"] - 0.30103) < 1e-4


def test_spatial_radius_join_no_cartesian_and_complete(spark):
    """The grid join must (a) carry no CartesianProduct — cell-id
    equi-join only — and (b) find EXACTLY the brute-force pair set on
    a planted cloud with same-cell, cross-cell-boundary, corner-
    adjacent, and just-outside pairs (the pigeonhole completeness the
    3x3 neighborhood guarantees)."""
    import contextlib
    import io

    from flink_template_spark.operators.spatial import radius_self_join

    r = 10
    pts = [
        (1, 5, 5),      # same cell as 2
        (2, 8, 6),      # d2(1,2) = 10 <= 100
        (3, 11, 5),     # next cell over; d2(2,3) = 10 <= 100
        (4, 19, 19),    # corner-adjacent to 5
        (5, 21, 21),    # d2(4,5) = 8 <= 100
        (6, 50, 50),    # isolated
        (7, 5, 16),     # d2(1,7) = 121 > 100: candidate but verify-rejected
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = radius_self_join(df, r)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()

    got = {(r_["id_a"], r_["id_b"]): r_["d2"] for r_ in out.collect()}
    brute = {}
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                brute[(min(ia, ib), max(ia, ib))] = d2
    assert got == brute
    assert (1, 2) in got and (2, 3) in got and (4, 5) in got
    assert (1, 7) not in got  # verify rejects the over-radius candidate


def test_interval_coverage_union_not_sum(spark, monkeypatch):
    """Hand-built overlap structure: [0,100]+[50,150] merge to one
    150 s block (a naive duration SUM says 200); a touching interval
    [150,160] EXTENDS the block (closed-interval semantics: start ==
    running max end is not a gap); [200,210] starts a new one."""
    import datetime

    import flink_template_spark.plans.events_time as ET

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, offset_s, dur_s):
        return (
            eid,
            base + datetime.timedelta(seconds=offset_s),
            uid,
            "click",
            dur_s / 60.0,
            "{}",
        )

    rows = [
        ev(1, 1, 0, 100),
        ev(2, 1, 50, 100),   # overlaps 1
        ev(3, 1, 150, 10),   # touches the merged end -> same block
        ev(4, 1, 200, 10),   # gap -> new block
        ev(5, 2, 0, 60),     # second user untouched
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: events)
    got = {r["user_id"]: r for r in ET.q_interval_coverage(spark, "x").collect()}
    u1 = got[1]
    assert u1["n_intervals"] == 4
    assert u1["n_blocks"] == 2
    assert u1["covered_s"] == 160 + 10  # [0,160] + [200,210]
    assert u1["longest_block_s"] == 160
    assert got[2]["covered_s"] == 60 and got[2]["n_blocks"] == 1


def test_term_drift_names_the_planted_mover(spark, monkeypatch):
    """Planted drift: token 'spamtok' floods odd doc_ids only; the
    audit's #1 mover must be exactly it, with ppm0=0 and the exact
    floor-divided ppm1; a balanced token never outranks it."""
    import flink_template_spark.plans.quality as Q

    rows = []
    for i in range(40):
        base = "alpha beta gamma delta"
        if i % 2 == 1:
            base = base + " spamtok spamtok spamtok"
        rows.append((i, base, "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(Q, "load_table", lambda s, sd, t: docs)
    out = Q.q_term_drift_topk(spark, "x").collect()
    top = out[0]
    assert top["w"] == "spamtok"
    assert top["ppm0"] == 0 and top["c0"] == 0
    # half 1: 20 docs x 7 tokens = 140 total, 60 spamtok
    assert top["c1"] == 60
    assert top["ppm1"] == 60 * 1000000 // 140
    # balanced tokens have |delta| from denominator shift only — small
    assert all(r["abs_delta_ppm"] <= top["abs_delta_ppm"] for r in out)


def test_twap_weights_by_holding_time_not_count(spark, monkeypatch):
    """THE TWAP property: a burst of high readings over one second
    barely moves TWAP while the naive mean is dominated by it.
    Planted: value 100 held for 1000 s, then ten 1-second holds at
    value 0, then a terminal event (no weight). TWAP = 100·1000 /
    1010 ≈ 99.0099; naive mean of values ≈ 9.2."""
    import datetime

    import flink_template_spark.plans.events_time as ET

    base = datetime.datetime(2024, 1, 1)
    rows = [(0, base, 7, "tick", 100.0, "{}")]
    for i in range(10):
        rows.append(
            (1 + i, base + datetime.timedelta(seconds=1000 + i), 7, "tick", 0.0, "{}")
        )
    rows.append((99, base + datetime.timedelta(seconds=1010), 7, "tick", 0.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: events)
    got = ET.q_twap_value(spark, "x").collect()[0]
    assert got["n_holds"] == 11  # terminal event holds nothing
    assert got["span_s"] == 1010
    assert abs(got["twap"] - 100.0 * 1000 / 1010) < 1e-6


def test_changepoint_finds_planted_level_shift(spark, monkeypatch):
    """Planted step function: 20 days at ~10/day then 20 days at
    ~30/day — the detected split must be the last low day, with the
    segment means recovering the two levels."""
    import datetime

    import flink_template_spark.plans.events_time as ET

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for d in range(40):
        vol = 10 if d < 20 else 30
        vol += d % 2  # small non-constant jitter
        for _ in range(vol):
            rows.append(
                (eid, base + datetime.timedelta(days=d, seconds=eid % 3600),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: events)
    got = ET.q_changepoint_volume(spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    assert r["split_day"] == (base + datetime.timedelta(days=19)).date()
    assert r["days_before"] == 20 and r["days_after"] == 20
    assert abs(r["mean_before"] - 10.5) < 0.01
    assert abs(r["mean_after"] - 30.5) < 0.01
    assert r["shift"] == r["mean_after"] - r["mean_before"]


def test_ab_test_detects_planted_lift_and_survives_degenerate(spark, monkeypatch):
    """Planted real effect: arm membership is the md5 parity of
    user_id, so plant conversions BY the arm each user actually lands
    in — arm 1 users convert, arm 0 users don't. The z-test must call
    it significant with the exact counts. A corpus where EVERYONE
    converts (zero pooled variance) must return z=0, not an ANSI
    divide-by-zero abort."""
    import datetime

    import flink_template_spark.plans.events_time as ET
    from flink_template_spark.functions.hashing import md5int_spark
    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 1)
    # discover each user's arm with the same portable hash the query uses
    uids = spark.createDataFrame([(u,) for u in range(60)], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in uids.select(
            "user_id",
            (F.expr(md5int_spark("CAST(user_id AS STRING)")) % 2).alias("arm"),
        ).collect()
    }
    rows = []
    eid = 0
    for u, arm in arms.items():
        n_buy = ET._AB_MIN_PURCHASES if arm == 1 else 0
        for _ in range(n_buy):
            rows.append((eid, base, u, "purchase", 1.0, "{}")); eid += 1
        rows.append((eid, base, u, "view", 1.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: events)
    r = ET.q_ab_test_readout(spark, "x").collect()[0]
    n1 = sum(1 for a in arms.values() if a == 1)
    assert (r["n_a"], r["n_b"]) == (60 - n1, n1)
    assert r["k_a"] == 0 and r["k_b"] == n1
    assert r["rate_a"] == 0.0 and r["rate_b"] == 1.0
    assert r["significant_95"] and r["z_stat"] > 5

    # degenerate: every user converts -> z = 0, no abort
    rows2 = []
    eid = 0
    for u in range(20):
        for _ in range(ET._AB_MIN_PURCHASES):
            rows2.append((eid, base, u, "purchase", 1.0, "{}")); eid += 1
    events2 = spark.createDataFrame(
        rows2,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: events2)
    r2 = ET.q_ab_test_readout(spark, "x").collect()[0]
    assert r2["z_stat"] == 0.0 and not r2["significant_95"]
    assert r2["rate_a"] == r2["rate_b"] == 1.0
