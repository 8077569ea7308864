"""Portable-HLL sketch properties (operators.sketches_portable):
merge ≡ union, determinism, and estimate accuracy at cardinalities well
past the linear-counting regime."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_template_spark.operators.sketches_portable import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_merge_equals_union(spark):
    """Registers of A∪B == element-wise max of A's and B's registers —
    the property that makes rollups lossless."""
    a = spark.range(0, 3000).select(F.lit("a").alias("g"), F.col("id"))
    b = spark.range(2000, 6000).select(F.lit("b").alias("g"), F.col("id"))
    both = a.union(b)

    merged = hll_merge(hll_registers(both, ["g"], "id"), [])
    direct = hll_registers(
        both.select(F.lit("all").alias("g"), "id"), ["g"], "id"
    ).select("bucket", "r")
    got = {(r.bucket, r.r) for r in merged.collect()}
    want = {(r.bucket, r.r) for r in direct.collect()}
    assert got == want


def test_estimate_accuracy_past_linear_range(spark):
    """At n >> 2.5m the harmonic branch is active; standard error for
    m=256 is ~1.04/sqrt(m) ≈ 6.5% — assert within 4 sigma."""
    n = 50_000
    df = spark.range(n).select(F.lit("x").alias("g"), F.col("id"))
    est = hll_estimate(hll_registers(df, ["g"], "id"), ["g"]).first()
    rel_err = abs(est.approx_distinct - n) / n
    assert rel_err < 4 * 1.04 / (HLL_M ** 0.5), rel_err


def test_registers_bounded_and_deterministic(spark):
    df = spark.range(10_000).select(F.lit("g").alias("g"), F.col("id"))
    regs1 = sorted(map(tuple, hll_registers(df, ["g"], "id").collect()))
    regs2 = sorted(map(tuple, hll_registers(df, ["g"], "id").collect()))
    assert regs1 == regs2
    assert len(regs1) <= HLL_M
    assert all(1 <= r for *_, r in regs1)


def test_cms_merge_equals_global_build(spark):
    """SUM-merging per-cell counter grids equals building one global
    sketch — counter addition is the lossless union."""
    from flink_template_spark.operators.sketches_portable import (
        cms_counters,
        cms_merge,
    )

    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("cell"),
        F.concat(F.lit("k"), (F.col("id") % 700).cast("string")).alias("k"),
    )
    per_cell = cms_counters(df, ["cell"], "k")
    merged = {(r.i, r.pos): r.cnt for r in cms_merge(per_cell, []).collect()}
    direct = {
        (r.i, r.pos): r.cnt for r in cms_counters(df, [], "k").collect()
    }
    assert merged == direct


def test_cms_never_underestimates(spark):
    from flink_template_spark.operators.sketches_portable import (
        cms_counters,
        cms_lookup,
    )

    df = spark.range(20000).select(
        F.concat(F.lit("w"), (F.col("id") % 1500).cast("string")).alias("k")
    )
    counters = cms_counters(df, [], "k")
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_lookup(counters, exact, "k")
    bad = est.filter(F.col("est_count") < F.col("exact")).count()
    assert bad == 0


def test_cms_lookup_unseen_key_estimates_zero(spark):
    """A key never inserted has at least one empty counter cell, so its
    CMS estimate is exactly 0 — and it must appear in the output (left
    join + coalesce, not an inner join that drops it)."""
    from flink_template_spark.operators.sketches_portable import (
        cms_counters,
        cms_lookup,
    )

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, "k STRING")
    counters = cms_counters(df, [], "k")
    keys = spark.createDataFrame([("a",), ("zzz_unseen",)], "k STRING")
    got = {r.k: r.est_count for r in cms_lookup(counters, keys, "k").collect()}
    assert got == {"a": 5, "zzz_unseen": 0}


def test_cms_lookup_rejects_per_cell_counters(spark):
    """cms_lookup joins on (i, pos) only, which is correct ONLY for a
    merged (cell-less) counter table; per-cell counters would silently
    cross-match cells and inflate estimates — misuse must fail loudly
    (ADVICE r3)."""
    import pytest

    from flink_template_spark.operators.sketches_portable import (
        cms_counters,
        cms_lookup,
        cms_merge,
    )

    df = spark.createDataFrame(
        [("c1", "a"), ("c1", "a"), ("c2", "a"), ("c2", "b")], "cell STRING, k STRING"
    )
    per_cell = cms_counters(df, ["cell"], "k")
    keys = spark.createDataFrame([("a",)], "k STRING")
    with pytest.raises(ValueError, match="cms_merge"):
        cms_lookup(per_cell, keys, "k")
    # the prescribed fix works
    got = cms_lookup(cms_merge(per_cell, []), keys, "k").first()
    assert got.est_count == 3


def test_hll_ignores_null_items(spark):
    """NULL items must not create a phantom register: an all-NULL cell
    estimates 0 distinct, and NULLs mixed with values change nothing."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("g", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    rows = [("mixed", i) for i in range(100)] + [("mixed", None)] * 5 + [
        ("allnull", None)
    ] * 3
    df = spark.createDataFrame(rows, schema)
    regs = hll_registers(df, ["g"], "v")
    assert regs.filter(F.col("g") == "allnull").count() == 0
    est = {
        r.g: r.approx_distinct
        for r in hll_estimate(regs, ["g"]).collect()
    }
    clean = hll_estimate(
        hll_registers(df.filter(F.col("v").isNotNull()), ["g"], "v"), ["g"]
    ).first()
    assert est["mixed"] == clean.approx_distinct
