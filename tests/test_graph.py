"""Unit tests for operators.pagerank and the PPJoin prefix-filter
set-similarity join (operators.dedup.jaccard_prefix_pairs).

The registry-level oracle comparison (test_queries_oracle) already
pins both against DuckDB on the real tables; these tests pin the
ALGORITHMS on adversarial hand-built inputs the synthetic corpus
doesn't exercise: a known-rank asymmetric graph, a dangling node,
threshold-boundary pairs, and the hot-boilerplate-shingle case that
prefix filtering exists to survive.
"""

from __future__ import annotations

from flink_template_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)
from flink_template_spark.operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    QUANT_PR,
    pagerank,
)


def _pagerank_reference(n_nodes: int, edges: list[tuple[int, int]], n_iter: int):
    """Pure-Python replay of the exact integer iteration."""
    base = QUANT_PR // n_nodes
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: base for v in range(n_nodes)}
    for _ in range(n_iter):
        sums = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {
            v: ((DAMP_DEN - DAMP_NUM) * base) // DAMP_DEN
            + (DAMP_NUM * sums[v]) // DAMP_DEN
            for v in range(n_nodes)
        }
    return rank


def test_pagerank_matches_reference_on_asymmetric_graph(spark):
    """4-node graph with a hub (everyone links to 0), a chain, and a
    dangling node (3 has no out-edges — its rank leaks, by design)."""
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3)]
    nodes_df = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["rank_q"]
        for r in pagerank(nodes_df, edges_df, n_iter=4).collect()
    }
    want = _pagerank_reference(4, edges, 4)
    assert got == want
    # the hub outranks everything; the only-fed-by-the-chain tail is last
    assert got[0] == max(got.values())
    assert got[3] == min(got.values())


def test_pagerank_rank_mass_conserved_without_dangling(spark):
    """On a graph with no dangling nodes the only mass loss is the
    integral-division truncation — total rank stays within n_nodes *
    (DAMP_DEN + max-truncation) of the initial mass, catching any
    double-count/drop of contributions."""
    # directed 3-cycle plus a chord
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    nodes_df = spark.createDataFrame([(i,) for i in range(3)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    ranks = [
        r["rank_q"] for r in pagerank(nodes_df, edges_df, n_iter=5).collect()
    ]
    assert len(ranks) == 3
    total = sum(ranks)
    # each of 5 rounds truncates < DAMP_DEN units per node per div site
    slack = 3 * 5 * 3 * DAMP_DEN
    assert QUANT_PR - slack <= total <= QUANT_PR


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_prefix_filter_matches_bruteforce_with_hot_shingle(spark):
    """A boilerplate sentence shared by EVERY doc (the bucket-join
    killer) plus genuinely similar pairs: the prefix-filtered join must
    return exactly the brute-force >= 0.5 answer."""
    boiler = "all rights reserved by the original author"
    texts = [
        f"the quick brown fox jumps over lazy dogs {boiler}",
        f"the quick brown fox jumps over lazy cats {boiler}",
        f"completely different words about spark engines {boiler}",
        f"completely different words about spark engines today {boiler}",
        f"unrelated text with nothing shared at all whatsoever {boiler}",
    ]
    docs = _docs(spark, texts)
    got = {
        (r["id_a"], r["id_b"], r["n_inter"], r["jaccard"])
        for r in jaccard_prefix_pairs(docs, t_num=1, t_den=2, n=3).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["n_inter"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == want
    assert got, "fixture must produce at least one qualifying pair"


def test_prefix_filter_exact_threshold_boundary(spark):
    """Integer threshold semantics: a pair at EXACTLY J = t must be
    kept (inter*t_den >= t_num*union, no float epsilon). Two 9-token
    docs sharing 7 of their 7+7-3=... construct J exactly 1/2: sets of
    sizes 6 and 6 sharing 4 shingles -> 4/8 = 1/2."""
    # 8-token docs -> 6 3-shingles each; first 6 tokens shared -> 4
    # shared shingles; union = 8 -> J = 0.5 exactly
    a = "w1 w2 w3 w4 w5 w6 xa xb"
    b = "w1 w2 w3 w4 w5 w6 yc yd"
    docs = _docs(spark, [a, b])
    rows = jaccard_prefix_pairs(docs, t_num=1, t_den=2, n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["n_inter"], r["jaccard"]) == (0, 1, 4, 0.5)
    # and just under the boundary is excluded at a tighter threshold
    assert (
        jaccard_prefix_pairs(docs, t_num=51, t_den=100, n=3).count() == 0
    )


def test_random_projection_preserves_norms_in_expectation(spark, sf_dir):
    """Rademacher JL property: for ±1 signs, E[(Px)_j^2] = ||x||^2 per
    output dim, so averaged over the corpus ||Px||^2 / (k*||x||^2)
    concentrates near 1 — catches sign-matrix indexing bugs (a
    misaligned element_at collapses the ratio) without pinning exact
    values (the DuckDB oracle already does that)."""
    import math

    from flink_template_spark.plans import registry
    from flink_template_spark.tables import load_table

    from pyspark.sql import functions as F

    proj = registry.QUERIES["q_random_projection"](spark, sf_dir)
    pn = proj.groupBy("vec_id").agg(
        F.sum(F.col("proj") * F.col("proj")).alias("p2")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("x2"),
    )
    row = (
        pn.join(emb, "vec_id")
        .agg(F.avg(F.col("p2") / (F.lit(8.0) * F.col("x2"))).alias("ratio"))
        .first()
    )
    assert row["ratio"] is not None and math.isfinite(row["ratio"])
    assert 0.8 < row["ratio"] < 1.2, row["ratio"]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word_st = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
_doc_st = st.lists(_word_st, min_size=5, max_size=12).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_st, min_size=3, max_size=7),
    thresh=st.sampled_from([(1, 3), (1, 2), (2, 3), (9, 20)]),
)
def test_prefix_filter_equals_bruteforce_property(spark, texts, thresh):
    """Hypothesis: on random tiny-vocab corpora (maximal shingle
    collisions — the adversarial case for prefix selection) the
    prefix-filtered join returns EXACTLY the brute-force answer at any
    rational threshold. Pairs are compared on ids and intersection size
    (the brute-force jaccard is float-rounded; the integer fields are
    the exact semantics)."""
    t_num, t_den = thresh
    docs = _docs(spark, texts)
    got = {
        (r["id_a"], r["id_b"], r["n_inter"])
        for r in jaccard_prefix_pairs(
            docs, t_num=t_num, t_den=t_den, n=2
        ).collect()
    }
    # brute force in plain Python over the same 2-gram shingle sets
    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * t_den >= t_num * union:
                    want.add((a, b, inter))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    n_iter=st.integers(1, 3),
)
def test_pagerank_property_matches_reference(spark, edges, n_iter):
    """Hypothesis: on random digraphs the distributed integer iteration
    equals the pure-Python replay exactly — any contribution routed to
    the wrong endpoint, dropped dangling node, or division-order drift
    breaks bigint equality."""
    nodes_df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["rank_q"]
        for r in pagerank(nodes_df, edges_df, n_iter=n_iter).collect()
    }
    assert got == _pagerank_reference(5, edges, n_iter)


from itertools import combinations  # noqa: E402

from flink_template_spark.operators.triangles import triangles  # noqa: E402


def _tri_brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    return {
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    }


def test_triangles_known_graph_with_hub(spark):
    """K4 plus a hub wired to everything: 4 triangles in K4 + C(4,2)=6
    through the hub; the hub's high degree must not duplicate or drop
    any (the orientation points every hub edge INTO the hub)."""
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    hub = [(v, 9) for v in range(4)]
    edges = k4 + hub
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
    want = _tri_brute(edges)
    assert got == want
    assert len(got) == 4 + 6


def test_triangles_ignores_direction_duplicates_and_self_loops(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
    assert got == {(0, 1, 2)}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=16,
    )
)
def test_triangles_property_matches_bruteforce(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
    assert got == _tri_brute(edges)


def _winnow_brute(text, k=3, w=4):
    """Pure-Python winnowing with rightmost-min tie-break."""
    import hashlib

    toks = text.split(" ")
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    out = set()
    for s in range(len(hs) - w + 1):
        win = hs[s : s + w]
        mn = min(win)
        pos = s + max(i for i, h in enumerate(win) if h == mn)
        out.add((mn, pos))
    return out


def test_winnowing_matches_python_reference(spark, sf_dir):
    """The Spark winnowing query equals the classic per-doc Python
    algorithm on the first documents of the real corpus."""
    from flink_template_spark.plans import registry
    from flink_template_spark.tables import load_table

    df = registry.QUERIES["q_winnowing_fingerprints"](spark, sf_dir)
    got = {}
    for r in df.filter("doc_id < 5").collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter("doc_id < 5")
        .collect()
    }
    for did, text in docs.items():
        assert got.get(did, set()) == _winnow_brute(text), did


def test_winnowing_shared_passage_guarantee(spark, monkeypatch):
    """THE winnowing guarantee: two docs sharing a >= w+k-1 = 6-token
    passage share at least one fingerprint HASH, however different the
    surrounding text."""
    passage = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"one two three four {passage} five six seven eight",
        f"nine ten {passage} eleven twelve thirteen fourteen fifteen",
    ]
    a, b = (_winnow_brute(t) for t in texts)
    shared = {h for h, _ in a} & {h for h, _ in b}
    assert shared, "reference must share a fingerprint"
    # and the Spark operator agrees on both docs
    df = _docs(spark, texts)
    import flink_template_spark.plans.text_dedup as TD

    monkeypatch.setattr(TD, "load_table", lambda s, d, t: df)
    out = TD.q_winnowing_fingerprints(spark, "unused")
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    assert got[0] == a and got[1] == b


def test_triangles_survives_64bit_node_ids(spark):
    """Node ids near 2^62 (hashed web-graph ids): the canonical corner
    ordering must not overflow bigint under ANSI mode (the old
    sum-minus-extremes middle-corner trick did)."""
    base = 1 << 62
    edges = [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [(r["a"], r["b"], r["c"]) for r in triangles(df).collect()]
    assert got == [(base, base + 1, base + 2)]


def test_knn_gemm_equals_exact(spark, sf_dir):
    """The BLAS path must reproduce knn_join_exact's exact rounded
    ranking — same comparator, same rounding grain, identical rows."""
    from flink_template_spark.operators.similarity import (
        knn_join_exact,
        knn_join_gemm,
    )
    from flink_template_spark.tables import load_table

    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
    got = sorted(map(key, knn_join_gemm(queries, emb, k=3).collect()))
    want = sorted(map(key, knn_join_exact(queries, emb, k=3).collect()))
    assert got == want


def test_knn_zero_norm_vectors_excluded_identically(spark):
    """Cosine is undefined for a zero-norm vector, and under ANSI mode
    (the Spark 4 default) the JVM division would abort the whole join —
    so BOTH knn paths exclude zero-norm rows from both sides, and must
    return identical results on a corpus containing one."""
    from flink_template_spark.operators.similarity import (
        knn_join_exact,
        knn_join_gemm,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero norm -> excluded everywhere
        (3, [0.5, 0.5, 0.0, 0.0]),
        (4, [float("nan"), 1.0, 0.0, 0.0]),  # NaN would rank FIRST
        (5, [float("inf"), 0.7, 0.1, 0.0]),  # Inf likewise corrupt
        (6, [0.3, 0.7, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    queries = df.filter("vec_id <= 2")  # includes the zero-norm query
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
    got = sorted(map(key, knn_join_gemm(queries, df, k=3).collect()))
    want = sorted(map(key, knn_join_exact(queries, df, k=3).collect()))
    assert got == want
    assert got, "non-degenerate queries must still produce neighbors"
    # none of the degenerate rows (zero/NaN/Inf) appear on either side
    assert not any(r[0] in (2, 4, 5) or r[2] in (2, 4, 5) for r in got)
    # an all-degenerate query set returns EMPTY, like the exact path
    degenerate = df.filter("vec_id = 2")
    assert knn_join_gemm(degenerate, df, k=3).count() == 0
    assert knn_join_exact(degenerate, df, k=3).count() == 0


def test_knn_null_and_subnormal_vectors_excluded_identically(spark):
    """The guard lives in the PLAN (valid_vec), so a NULL embedding
    must not crash the GEMM path's numpy conversion, and a vector of
    all-subnormal doubles (whose squares underflow to norm 0 — an
    ANSI divide-by-zero the elementwise nonzero check would miss)
    is excluded on both paths."""
    from flink_template_spark.operators.similarity import (
        knn_join_exact,
        knn_join_gemm,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, None),  # NULL embedding: dropped, not a numpy crash
        (3, [1e-200, 1e-201, 0.0]),  # norm underflows to exactly 0.0
        (4, [1e200, 0.0, 0.0]),  # norm overflows to +Inf -> NaN sims
        (5, [0.4, 0.6, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id in (0, 2, 3)")
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
    got = sorted(map(key, knn_join_gemm(queries, df, k=3).collect()))
    want = sorted(map(key, knn_join_exact(queries, df, k=3).collect()))
    assert got == want
    assert got, "the valid query must still produce neighbors"
    assert not any(r[0] in (2, 3, 4) or r[2] in (2, 3, 4) for r in got)


def test_knn_gemm_generic_string_ids(spark):
    """knn_join_gemm mirrors knn_join_exact's id-type genericity — a
    string id column must ride through the Arrow batch untouched, not
    hit an int64 coercion."""
    from flink_template_spark.operators.similarity import (
        knn_join_exact,
        knn_join_gemm,
    )

    rows = [
        ("doc-a", [1.0, 0.0, 0.0]),
        ("doc-b", [0.9, 0.1, 0.0]),
        ("doc-c", [0.5, 0.5, 0.0]),
        ("doc-d", [0.1, 0.9, 0.2]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<float>")
    queries = df.filter("doc_id in ('doc-a', 'doc-d')")
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
    got = sorted(
        map(key, knn_join_gemm(queries, df, k=2, id_col="doc_id").collect())
    )
    want = sorted(
        map(key, knn_join_exact(queries, df, k=2, id_col="doc_id").collect())
    )
    assert got == want and len(got) == 4
    assert {type(r[0]) for r in got} == {str}


def test_cosine_family_survives_zero_norm_vectors(spark):
    """One degenerate (all-zero) vector must not abort any cosine-family
    operator under ANSI mode — each excludes it and still returns the
    non-degenerate results; quantize_int8 round-trips it losslessly."""
    from flink_template_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )
    from flink_template_spark.operators.similarity import (
        brute_force_topk,
        cosine_near_dup_exact,
        cosine_near_dup_lsh,
        ivf_assign,
        ivf_topk,
        semdedup,
    )

    from pyspark.sql import functions as F

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [0.5, 0.5, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = df.filter("vec_id = 0").select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assert brute_force_topk(df, df.filter("vec_id = 0"), k=3).count() == 2
    assigned = ivf_assign(df, cents).collect()
    assert {r["vec_id"] for r in assigned} == {0, 1, 3}
    assert cosine_near_dup_exact(df, threshold=0.5).count() > 0
    cosine_near_dup_lsh(df, threshold=0.5).count()  # must not abort
    semdedup(df, cents, threshold=0.99).count()  # must not abort
    # a degenerate QUERY vector must not abort the probe path either
    assert ivf_topk(df, cents, df.filter("vec_id = 2"), k=3).count() == 0
    assert ivf_topk(df, cents, df.filter("vec_id = 1"), k=3).count() > 0
    q = df.select(
        "vec_id", dequantize_int8(quantize_int8(F.col("embedding"))).alias("d")
    ).collect()
    dec = {r["vec_id"]: r["d"] for r in q}
    assert dec[2] == [0.0, 0.0, 0.0, 0.0]  # lossless zero round-trip


def test_exact_moments_single_row_group_is_null_not_abort(spark, monkeypatch):
    """A group with one event has undefined sample variance: NULL (the
    var_samp convention, mirrored by the oracle's NULLIF), not an
    ANSI-mode divide-by-zero job abort."""
    import flink_template_spark.plans.events_time as ET
    from flink_template_spark.plans import registry

    ev = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 4.0)],
        "event_type string, value double",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: ev)
    rows = {
        r["event_type"]: r["variance"]
        for r in registry.QUERIES["q_events_exact_moments"](
            spark, "unused"
        ).collect()
    }
    assert rows["a"] is None
    assert rows["b"] == 2.0


def test_kcore_hand_graph(spark):
    """K4 plus a pendant chain: the 3-core is exactly the K4 (each
    corner degree 3); the chain peels away over CASCADING rounds (the
    chain end enables the next peel — one round is not enough)."""
    from flink_template_spark.operators.kcore import kcore

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6), (6, 7)]  # pendant path off corner 4
    df = spark.createDataFrame(k4 + chain, "src long, dst long")
    got = {
        r["node"]: r["core_deg"] for r in kcore(df, k=3, rounds=4).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # under-budgeted rounds give a SUPERSET (not-yet-peeled chain
    # nodes), never a wrong deletion
    partial = {r["node"] for r in kcore(df, k=2, rounds=0).collect()}
    assert partial >= {1, 2, 3, 4}


def test_kcore_2core_drops_all_trees(spark):
    """A tree has no 2-core: peeling must empty it completely, which
    takes rounds proportional to the tree depth (cascade proof)."""
    from flink_template_spark.operators.kcore import kcore

    path = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(path, "src long, dst long")
    assert kcore(df, k=2, rounds=4).count() == 0


def test_kcore_trade_fixpoint(spark, sf_dir):
    """5 peel rounds must BE the fixpoint on the trade graph at the
    configured SF: one more round changes nothing (q_kcore_trade's
    round budget is sized, not guessed)."""
    from flink_template_spark.operators.kcore import kcore
    from flink_template_spark.plans.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _trade_edges,
    )

    edges = _trade_edges(spark, sf_dir)
    key = lambda r: (r["node"], r["core_deg"])
    at_budget = sorted(
        map(key, kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS).collect())
    )
    one_more = sorted(
        map(key, kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS + 1).collect())
    )
    assert at_budget == one_more
    # the 12-core is EMPTY at sf0.001 (max thresholded degree 15, but
    # peeling cascades to nothing — verified against DuckDB) and 19/25
    # nations at sf0.01/sf0.1; the driver's sf0.01 oracle gate covers
    # the non-empty path, this test pins the round budget at any SF


def test_trustrank_decays_from_seeds(spark):
    """Trust must flow FROM the seed set: on a seed -> mid -> far chain
    plus a disconnected spam pair, the seed outranks mid outranks far,
    and nodes unreachable from any seed get EXACTLY the zero-teleport
    floor (0 — integer arithmetic, no epsilon) while uniform PageRank
    gives them positive mass."""
    from flink_template_spark.operators.pagerank import pagerank, trustrank

    edges = [(0, 1), (1, 2), (3, 4), (4, 3)]  # chain 0->1->2; spam cycle 3<->4
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    tr = {
        r["id"]: r["rank_q"]
        for r in trustrank(nodes, edges_df, seeds, n_iter=4).collect()
    }
    pr = {
        r["id"]: r["rank_q"]
        for r in pagerank(nodes, edges_df, n_iter=4).collect()
    }
    assert tr[0] > tr[1] > tr[2] > 0  # decay along the trust chain
    assert tr[3] == 0 and tr[4] == 0  # unreachable from seeds: exact 0
    assert pr[3] > 0 and pr[4] > 0  # uniform teleport keeps spam afloat
    # duplicate seed rows (a fanning seed join) must not fan the base
    # vector out or dilute the teleport mass
    dup_seeds = spark.createDataFrame([(0,), (0,)], "id long")
    tr_dup = trustrank(nodes, edges_df, dup_seeds, n_iter=4).collect()
    assert len(tr_dup) == 5
    assert {r["id"]: r["rank_q"] for r in tr_dup} == tr


def test_bfs_hops_hand_graph(spark):
    """Directed chain + multi-source min + unreached absence: hops
    follow edge direction only, the nearest source wins, and nodes
    beyond the round budget (or unreachable) are absent."""
    from flink_template_spark.operators.bfs import bfs_hops

    # 0 -> 1 -> 2 -> 3;  5 -> 2 (second source closer to 2);  4 isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 2)], "src long, dst long"
    )
    sources = spark.createDataFrame([(0,), (5,)], "id long")
    got = {
        r["id"]: r["hops"] for r in bfs_hops(edges, sources, rounds=4).collect()
    }
    assert got == {0: 0, 5: 0, 1: 1, 2: 1, 3: 2}  # 2 via 5 (min), not via 0
    # direction respected: nothing reaches 4, nothing flows backwards
    assert 4 not in got
    # truncated budget: with 1 round, node 3 (2 hops) is absent
    one = {
        r["id"]: r["hops"] for r in bfs_hops(edges, sources, rounds=1).collect()
    }
    assert one == {0: 0, 5: 0, 1: 1, 2: 1}


def test_coreset_greedy_properties(spark):
    """Facility-location greedy invariants on a hand-built set: the
    first pick is the hub closest to everything, marginal gains are
    non-increasing (submodularity + greedy), and the reported running
    total equals the recomputed coverage of the selected prefix."""
    from flink_template_spark.operators.coreset import (
        facility_location_greedy,
        pair_sims_q,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # near 0
        (2, [0.8, 0.2, 0.0]),  # near 0 — the hub's neighborhood
        (3, [0.0, 1.0, 0.0]),  # orthogonal outlier
        (4, [0.0, 0.0, 1.0]),  # second orthogonal outlier
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = facility_location_greedy(df, k=3)
    assert [p["round"] for p in picks] == [1, 2, 3]
    assert picks[0]["vec_id"] in (0, 1, 2)  # a hub, never an outlier
    gains = [p["gain_q"] for p in picks]
    assert gains == sorted(gains, reverse=True)  # diminishing returns
    # running total == recomputed coverage of the selected prefix
    chosen = {p["vec_id"] for p in picks}
    sims = pair_sims_q(df).collect()
    best = {}
    for r in sims:
        if r["c"] in chosen:
            best[r["d"]] = max(best.get(r["d"], 0), r["sim_q"])
    assert picks[-1]["total_cov_q"] == sum(best.values())


def test_trade_edges_memoized_per_session(spark, sf_dir):
    """All five graph queries share one persisted trade-edge table per
    (session, sf_dir): repeated calls return the SAME DataFrame (no
    re-running the 4-way lineitem join), and its plan reads back from
    the in-memory cache (VERDICT r5 next #2)."""
    import contextlib
    import io

    from flink_template_spark.plans.graph import _trade_edges

    e1 = _trade_edges(spark, sf_dir)
    e2 = _trade_edges(spark, sf_dir)
    assert e1 is e2
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        e1.explain("formatted")
    plan = buf.getvalue()
    # lineage truncated to the checkpointed blocks: consumers must not
    # re-plan the 4-way lineitem join per reference
    assert "Scan ExistingRDD" in plan
    assert "lineitem" not in plan


def _hits_reference(n_nodes, edges, n_iter):
    """Pure-Python replay of operators.hits integer arithmetic."""
    from flink_template_spark.operators.hits import QUANT_HITS

    hub = {v: QUANT_HITS // n_nodes for v in range(n_nodes)}
    auth = {}

    def prop(score, frm_to):
        raw = {}
        for s, d in edges:
            a, b = (s, d) if frm_to == "sd" else (d, s)
            if a in score:
                raw[b] = raw.get(b, 0) + score[a]
        t = sum(raw.values())
        return {
            v: (raw.get(v, 0) * QUANT_HITS) // t if v in raw else 0
            for v in range(n_nodes)
        }

    for _ in range(n_iter):
        auth = prop(hub, "sd")
        hub = prop(auth, "ds")
    return hub, auth


def test_hits_matches_reference_and_separates_roles(spark):
    """Bipartite-ish graph: node 0 points at everything (pure hub,
    nothing points at it -> auth 0); node 3 is pointed at by everyone
    (pure authority, points at nothing -> hub 0)."""
    from flink_template_spark.operators.hits import hits

    edges_py = [(0, 1), (0, 2), (0, 3), (1, 3), (2, 3)]
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id INT")
    edges = spark.createDataFrame(edges_py, "src INT, dst INT")
    got = {
        r["id"]: (r["hub_q"], r["auth_q"])
        for r in hits(nodes, edges, n_iter=2).collect()
    }
    hub, auth = _hits_reference(4, edges_py, 2)
    assert got == {v: (hub[v], auth[v]) for v in range(4)}
    assert got[0][1] == 0  # nothing points at the pure hub
    assert got[3][0] == 0  # the pure authority points at nothing
    assert got[0][0] == max(h for h, _ in got.values())
    assert got[3][1] == max(a for _, a in got.values())


def test_hits_property_matches_reference(spark):
    import random

    from flink_template_spark.operators.hits import hits

    rng = random.Random(7)
    n = 8
    edges_py = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(20)
        }
    )
    edges_py = [(s, d) for s, d in edges_py if s != d]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id INT")
    edges = spark.createDataFrame(edges_py, "src INT, dst INT")
    for n_iter in (1, 3):
        got = {
            r["id"]: (r["hub_q"], r["auth_q"])
            for r in hits(nodes, edges, n_iter=n_iter).collect()
        }
        hub, auth = _hits_reference(n, edges_py, n_iter)
        assert got == {v: (hub[v], auth[v]) for v in range(n)}
        # sum-normalization keeps every score bounded by the scale
        from flink_template_spark.operators.hits import QUANT_HITS

        assert all(
            0 <= h <= QUANT_HITS and 0 <= a <= QUANT_HITS
            for h, a in got.values()
        )


def test_binary_hamming_topk_codes_and_ranking(spark):
    """Sign packing matches a pure-Python reference, an identical
    vector is Hamming-0 and rank-1, and a sign-flipped vector lands
    last in Hamming order (all 64 bits differ)."""
    import random

    from pyspark.sql import functions as F

    from flink_template_spark.functions.vector import sign_pack_expr
    from flink_template_spark.operators.similarity import binary_hamming_topk

    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [
        (0, base),
        (1, list(base)),                      # identical -> hamming 0
        (2, [-x if x != 0 else -1.0 for x in base]),  # all signs flipped
        (3, [x + rng.uniform(-0.05, 0.05) for x in base]),  # near-dup
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # packing parity with the reference
    packed = emb.select(
        "vec_id",
        F.expr(sign_pack_expr("embedding", 1, 32)).alias("p0"),
        F.expr(sign_pack_expr("embedding", 33, 32)).alias("p1"),
    ).collect()
    emb_py = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in packed:
        v = emb_py[r["vec_id"]]
        want0 = sum((1 << j) for j in range(32) if v[j] >= 0)
        want1 = sum((1 << j) for j in range(32) if v[32 + j] >= 0)
        assert (r["p0"], r["p1"]) == (want0, want1), r["vec_id"]

    got = binary_hamming_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=3, shortlist=3
    ).collect()
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["neighbor_id"] == 1 and by_rank[1]["hamming"] == 0
    assert by_rank[1]["cos_sim"] == 1.0
    # the flipped vector can never enter a 3-wide shortlist over
    # {identical, near-dup, flipped}: its hamming is the maximum 64
    assert all(r["neighbor_id"] != 2 or r["hamming"] == 64 for r in got)
    neighbors = {r["neighbor_id"] for r in got}
    assert neighbors == {1, 2, 3}  # shortlist=3 admits all three here
    assert by_rank[3]["neighbor_id"] == 2  # flipped reranks last (cos -1)
