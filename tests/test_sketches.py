"""Approximate sketches: error bounds vs exact answers."""

from __future__ import annotations


def test_hll_within_rsd(spark, sf_dir):
    from flink_template_spark import plans

    rows = plans.QUERIES["q_approx_distinct_users"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # rsd 2% → generous 3-sigma-ish bound
        assert abs(r.approx_users - r.exact_users) <= max(3, 0.06 * r.exact_users)


def test_approx_percentile_close(spark, sf_dir):
    from flink_template_spark import plans

    rows = plans.QUERIES["q_approx_percentile_value"](spark, sf_dir).collect()
    for r in rows:
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * max(abs(r.exact_p50), 1.0)


def test_lsh_near_dup_recall(spark, sf_dir):
    """The LSH scale path must recall a usable fraction of the exact
    near-dup pairs (8 bands x 4 bits at cos>=0.4 → theory ~0.7; assert
    a conservative floor) and must never invent pairs (precision 1.0 by
    construction — candidates are exact-verified)."""
    from flink_template_spark import plans

    exact = {
        (r.id_a, r.id_b)
        for r in plans.QUERIES["q_embedding_near_dup_exact"](spark, sf_dir).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in plans.QUERIES["q_embedding_near_dup_lsh"](spark, sf_dir).collect()
    }
    assert lsh <= exact  # no false positives past the exact verify
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.4, f"LSH recall {recall:.2f} below floor"


def test_hll_mergeable_rollup_matches_exact(spark, sf_dir):
    """Union of per-day sketches ≈ exact distinct per type: merging
    sketches must not degrade the estimate beyond HLL's rsd bound."""
    from pyspark.sql import functions as F

    from flink_template_spark import plans
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_hll_mergeable_rollup"](spark, sf_dir).collect()
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r.n_daily_sketches > 1  # genuinely merged, not one bucket
        assert abs(r.approx_users - exact[r.event_type]) <= max(
            3, 0.05 * exact[r.event_type]
        )


def test_kmv_exact_when_under_k(spark):
    """A cell whose distinct count never fills the sketch is EXACT
    (theta = full range, est = n), and disjoint cells discriminate."""
    from flink_template_spark.operators.sketches_portable import (
        KMV_RANGE,
        kmv_estimate,
        kmv_sketch,
    )

    rows = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(5)]
    df = spark.createDataFrame(rows * 3, "cell string, item long")  # dups collapse
    est = {
        r["cell"]: r
        for r in kmv_estimate(kmv_sketch(df, ["cell"], "item"), ["cell"]).collect()
    }
    assert est["a"]["est"] == 10.0 and est["a"]["theta"] == KMV_RANGE
    assert est["b"]["est"] == 5.0 and est["b"]["n_h"] == 5


def test_kmv_estimate_accuracy_and_set_ops(spark):
    """Estimating branch: half-overlapping 500-element sets; per-side,
    union, and intersection estimates must land within the KMV rsd
    envelope (~1/sqrt(k-1) ≈ 12.6% at k=64; assert 3x that)."""
    from pyspark.sql import functions as F

    from flink_template_spark.operators.sketches_portable import (
        KMV_K,
        KMV_NUM,
        KMV_RANGE,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    # a = {0..499}, b = {250..749}: |a|=|b|=500, |a∪b|=750, |a∩b|=250
    rows = [("a", i) for i in range(500)] + [("b", 250 + i) for i in range(500)]
    df = spark.createDataFrame(rows, "cell string, item long")
    sk = kmv_sketch(df, ["cell"], "item").localCheckpoint()
    est = {r["cell"]: r for r in kmv_estimate(sk, ["cell"]).collect()}
    tol = 3 * (1.0 / (KMV_K - 1) ** 0.5)
    assert abs(est["a"]["est"] - 500) <= tol * 500
    assert abs(est["b"]["est"] - 500) <= tol * 500
    # union: merge the two sketches under one key, re-estimate
    u = kmv_merge(sk.select(F.lit("u").alias("cell"), "h"), ["cell"])
    u_est = kmv_estimate(u, ["cell"]).collect()[0]["est"]
    assert abs(u_est - 750) <= tol * 750
    # intersection: common retained hashes below min theta
    theta = min(est["a"]["theta"], est["b"]["theta"])
    a_h = {r["h"] for r in sk.filter("cell = 'a'").collect()}
    b_h = {r["h"] for r in sk.filter("cell = 'b'").collect()}
    common = [h for h in a_h & b_h if h < theta]
    i_est = len(common) * KMV_RANGE / theta
    # intersection rsd is worse (small Jaccard); assert a loose sanity band
    assert 250 * 0.3 <= i_est <= 250 * 2.2


def test_kmv_merge_equals_rebuild(spark):
    """Merging per-cell sketches must equal the sketch built directly
    on the union of the rows — the k smallest of a union is a subset
    of each side's k smallest, so kmv_merge is lossless BY VALUE, not
    approximately."""
    from pyspark.sql import functions as F

    from flink_template_spark.operators.sketches_portable import (
        kmv_merge,
        kmv_sketch,
    )

    rows = [("a", i * 7) for i in range(300)] + [("b", i * 11) for i in range(300)]
    df = spark.createDataFrame(rows, "cell string, item long")
    merged = kmv_merge(
        kmv_sketch(df, ["cell"], "item").select(F.lit("all").alias("cell"), "h"),
        ["cell"],
    )
    direct = kmv_sketch(df.select(F.lit("all").alias("cell"), "item"), ["cell"], "item")
    got = sorted(r["h"] for r in merged.collect())
    want = sorted(r["h"] for r in direct.collect())
    assert got == want


def test_sorted_neighborhood_rejects_degenerate_window(spark):
    """window=1 means 'no neighbors' — a loud ValueError at call time,
    not a NoneType crash deep in plan assembly."""
    import pytest

    from flink_template_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [(0, "a b c", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(docs, window=1)


def test_table_stats_ndv_branches_and_nulls(spark, sf_dir):
    """Low-cardinality columns get EXACT NDV (sketch under k), key
    columns get estimates within the KMV rsd envelope, and null
    accounting is exact."""
    from flink_template_spark.operators.sketches_portable import KMV_K
    from flink_template_spark.plans import registry

    rows = {
        r["col_name"]: r
        for r in registry.QUERIES["q_table_stats"](spark, sf_dir).collect()
    }
    assert set(rows) == {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus",
    }
    flag = rows["l_returnflag"]
    assert flag["ndv_est"] == flag["ndv_exact"] and flag["ndv_exact"] <= 4
    ok = rows["l_orderkey"]
    assert ok["ndv_exact"] > KMV_K  # estimating branch exercised
    tol = 3 * (1.0 / (KMV_K - 1) ** 0.5)
    assert abs(ok["ndv_est"] - ok["ndv_exact"]) <= tol * ok["ndv_exact"]
    assert all(r["n_nulls"] == 0 for r in rows.values())
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # every column saw every row


def test_table_stats_reports_all_null_column(spark, monkeypatch):
    """An all-NULL column has no KMV sketch rows (NULL items drop) but
    is exactly what a stats sweep must flag: n_nulls = n_rows and
    ndv 0 — not a silently vanished output row."""
    import flink_template_spark.plans.functions_ext as FE

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "l_orderkey long, l_comment string"
    )
    monkeypatch.setattr(FE, "load_table", lambda s, sd, t: df)
    monkeypatch.setattr(FE, "_STATS_COLS", ["l_orderkey", "l_comment"])
    rows = {r["col_name"]: r for r in FE.q_table_stats(spark, "unused").collect()}
    assert set(rows) == {"l_orderkey", "l_comment"}
    c = rows["l_comment"]
    assert (c["n_rows"], c["n_nulls"], c["ndv_est"], c["ndv_exact"]) == (3, 3, 0.0, 0)
    o = rows["l_orderkey"]
    assert (o["n_nulls"], o["ndv_est"], o["ndv_exact"]) == (0, 3.0, 3)


def test_coreset_exhaustion_returns_distinct_prototypes(spark):
    """Duplicate embeddings saturate coverage after one pick: the
    remaining rounds must return DISTINCT exemplars with zero marginal
    gain (never the same id twice), and a universe smaller than k
    stops early instead of inventing picks."""
    from flink_template_spark.operators.coreset import facility_location_greedy

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    picks = facility_location_greedy(df, k=3)
    ids = [p["vec_id"] for p in picks]
    assert ids == [0, 1, 2]  # distinct, id-ordered once gains are 0
    assert [p["gain_q"] for p in picks][1:] == [0, 0]
    assert facility_location_greedy(df.filter("vec_id < 2"), k=5)[-1]["round"] == 2
