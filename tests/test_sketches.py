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
