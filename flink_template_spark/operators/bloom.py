"""Bloom-filter join pruning built from public Spark expressions.

At 100 TB the dominant cost of a selective fact⋈dim join is shuffling
fact rows that will never match. Spark's own runtime row-level filtering
does this automatically for shuffle joins when thresholds allow
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this module is
the explicit, always-available version of the same idea — useful when
the build side is an arbitrary DataFrame (not a scan) or when the probe
side must be pruned *before* an expensive upstream stage.

Construction is fully distributed and stays JVM-side:

1. build side → k = ``n_hashes`` positions per key via seeded
   ``xxhash64`` mod m;
2. positions → (word, bit) → ``bit_or`` partial-aggregate into at most
   ``m/64`` words (one small shuffle, map-side combined);
3. the word bitmap (an ``array<long>``, ~180 KB per million keys at 1%
   fpp) is broadcast to the probe side as a 1-row DataFrame;
4. the probe is a pure Column expression — k hash + shift + AND ops in
   whole-stage codegen; no Python, no UDF.

A Bloom filter never yields false negatives, so following the pruned
probe with the exact join returns exactly the plain join's rows — which
is what the DuckDB oracle checks.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEEDS = [0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1, 0xFD7046C5]


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        for seed in _SEEDS[:n_hashes]
    ]


def bloom_words(m_bits: int) -> int:
    return (m_bits + 63) // 64


def optimal_m_bits(n_items: int, fpp: float = 0.01) -> int:
    n_items = max(1, n_items)
    m = -n_items * math.log(fpp) / (math.log(2) ** 2)
    return max(64, 64 * ((int(m) + 63) // 64))


def assemble_bitmap(pos: DataFrame, m_bits: int) -> DataFrame:
    """Turn a 1-column DataFrame of bit positions (``p``) into the
    1-row ``(__bloom: array<long>)`` word bitmap. The only shuffle is
    the ``bit_or`` aggregation over word indices (≤ m/64 groups,
    map-side combined), then a tiny final array assembly. Shared by
    the xxhash64 production path and the md5-portable audit path."""
    n_words = bloom_words(m_bits)
    words = pos.select(
        (F.col("p") / 64).cast("long").alias("w"),
        # dynamic shift count needs the SQL form (the pyspark wrapper
        # only takes a literal numBits)
        F.expr("shiftleft(1L, cast(p % 64 AS INT))").alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("word"))
    # Assemble the dense array: left-join the full word range against the
    # sparse non-zero words. n_words rows total — trivially small.
    return (
        words.sparkSession.range(n_words)
        .withColumnRenamed("id", "w")
        .join(words, "w", "left")
        .select(F.col("w"), F.coalesce("word", F.lit(0)).alias("word"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("w", "word"))).alias("ww"))
        .select(F.transform("ww", lambda s: s.getField("word")).alias("__bloom"))
    )


def build_bloom(
    build: DataFrame, key: str, m_bits: int, n_hashes: int = 4
) -> DataFrame:
    """Distributed build: returns a 1-row DataFrame ``(__bloom:
    array<long>)`` of ``m_bits/64`` words."""
    pos = build.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, n_hashes))).alias("p")
    )
    return assemble_bitmap(pos, m_bits)


def bits_all_set(bloom_col: Column, positions: list[Column]) -> Column:
    """All-bits-set probe over explicit position columns, pure
    expressions (codegen-friendly)."""
    cond = F.lit(True)
    for p in positions:
        word = F.element_at(bloom_col, (p / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, p % 64) == 1)
    return cond


def might_contain(bloom_col: Column, key: Column, m_bits: int, n_hashes: int) -> Column:
    """All-k-bits-set probe with the production xxhash64 family."""
    return bits_all_set(bloom_col, _positions(key, m_bits, n_hashes))


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    expected_items: int,
    fpp: float = 0.01,
    n_hashes: int = 4,
) -> DataFrame:
    """Return probe rows whose key *might* be in build (no false
    negatives; ~fpp false positives). The bloom bitmap rides along as a
    broadcast nested-loop of a single row, then is dropped."""
    m_bits = optimal_m_bits(expected_items, fpp)
    bloom = build_bloom(build, build_key, m_bits, n_hashes)
    return (
        probe.join(F.broadcast(bloom))
        .filter(might_contain(F.col("__bloom"), F.col(probe_key), m_bits, n_hashes))
        .drop("__bloom")
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    expected_items: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Semi join with Bloom pre-pruning: the exact left-semi join after
    the probe removes the false positives, so results are identical to a
    plain semi join — the shuffle just carries ~fpp of the non-matching
    rows instead of all of them."""
    pruned = bloom_prune(probe, build, probe_key, build_key, expected_items, fpp)
    return pruned.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
