"""Wide-signature SimHash: exactness of banded blocking past 32 bits.

The banding in ``simhash_hamming_pairs`` is exact by pigeonhole at any
width, but its bucket count — 2^(bits/n_bands) per band — is what keeps
the bucket join sub-quadratic at corpus scale. These tests pin the
60-bit path (the widest md5-prefix hash that fits signed int64):

- signatures actually use the upper bits (a fixed 32-bit token hash
  would leave them constant);
- banded pairs at 60 bits equal the brute-force all-pairs Hamming scan
  on the same signatures (exactness).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),  # near dup of 1
        (4, "one two three four five six seven eight"),
        (5, "totally different words appear in this document here"),
        (6, "one two three four five six seven nine"),  # near dup of 4
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_wide_signature_uses_upper_bits(spark):
    from flink_template_spark.operators.dedup import simhash_signatures

    sigs = simhash_signatures(_docs(spark), bits=60)
    upper = [r.simhash >> 32 for r in sigs.collect()]
    # distinct documents must disagree somewhere above bit 31
    assert len(set(upper)) > 1


def test_banded_pairs_match_bruteforce_at_60_bits(spark):
    from flink_template_spark.operators.dedup import (
        simhash_hamming_pairs,
        simhash_signatures,
    )

    docs = _docs(spark)
    max_h = 3
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(
            docs, max_hamming=max_h, bits=60, n_bands=4
        ).collect()
    }

    sigs = simhash_signatures(docs, bits=60)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
                .cast("int")
                .alias("hamming"),
            )
            .filter(F.col("hamming") <= max_h)
        ).collect()
    }
    assert banded == brute
    assert any(p[0] == 1 and p[1] == 2 for p in banded)  # the exact dup pair
