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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    build_keys=st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=60),
    probe_keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=200
    ),
)
def test_property_never_drops_a_true_match(spark, build_keys, probe_keys):
    """For ANY build/probe key sets (negative, zero, duplicates), every
    probe key present in the build side survives pruning — the Bloom
    no-false-negative invariant the oracle equality rests on."""
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    build = spark.createDataFrame(
        [(k,) for k in build_keys] or [(None,)], "bk long"
    ).filter("bk IS NOT NULL")
    pruned = bloom_prune(
        probe, build, "k", "bk", expected_items=max(1, len(build_keys))
    )
    kept = {r.k for r in pruned.collect()}
    truth = {k for k in probe_keys if k in build_keys}
    assert truth <= kept
