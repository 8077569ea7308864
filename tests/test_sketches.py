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
