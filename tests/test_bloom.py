"""operators.bloom: no false negatives, bounded false positives, and a
pure-JVM probe plan (the whole point — no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_template_spark.operators.bloom import (
    bloom_prune,
    bloom_semi_join,
    optimal_m_bits,
)


def test_no_false_negatives_and_bounded_fp(spark):
    probe = spark.range(50_000).select(F.col("id").alias("k"))
    build = spark.range(0, 50_000, 100).select(F.col("id").alias("bk"))  # 500 keys
    pruned = bloom_prune(probe, build, "k", "bk", expected_items=500, fpp=0.01)
    kept = {r.k for r in pruned.collect()}
    truth = set(range(0, 50_000, 100))
    assert truth <= kept  # Bloom guarantee: nothing true is dropped
    fp = len(kept - truth) / (50_000 - len(truth))
    assert fp < 0.05  # 1% target with headroom


def test_semi_join_equals_exact(spark):
    probe = spark.range(20_000).select((F.col("id") % 7_000).alias("k"))
    build = spark.range(100).select((F.col("id") * 13).alias("bk"))
    via_bloom = bloom_semi_join(probe, build, "k", "bk", expected_items=100)
    exact = probe.join(
        build.select(F.col("bk").alias("k")).distinct(), "k", "left_semi"
    )
    assert via_bloom.exceptAll(exact).count() == 0
    assert exact.exceptAll(via_bloom).count() == 0


def test_probe_plan_is_jvm_only(spark):
    probe = spark.range(1_000).select(F.col("id").alias("k"))
    build = spark.range(10).select(F.col("id").alias("bk"))
    pruned = bloom_prune(probe, build, "k", "bk", expected_items=10)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "xxhash64" in plan.lower()


def test_m_bits_sizing():
    # ~9.6 bits/key at 1% fpp, rounded up to whole 64-bit words
    m = optimal_m_bits(1_000_000, 0.01)
    assert 9_000_000 < m < 10_500_000
    assert m % 64 == 0
