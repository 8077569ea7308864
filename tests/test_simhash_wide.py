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


def test_sorted_neighborhood_planted_near_dups(spark):
    """SNM on its home turf — planted near-dups that share sort
    prefixes: both suffix edits (pass 1 catches: same text prefix) and
    prefix edits (pass 1 MISSES, the reversed-word pass 2 catches).
    Precision must be 1 (exact verification) and every planted pair
    must be recalled."""
    from flink_template_spark.operators.dedup import (
        ngram_jaccard_pairs,
        sorted_neighborhood_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "en"),
        (1, base + " mu", "en"),  # suffix edit: adjacent in pass 1
        (2, "nu " + base, "en"),  # prefix edit: adjacent only in pass 2
        (3, "totally different words here about nothing shared", "en"),
        (4, "more unrelated filler text padding out the corpus fully", "en"),
        (5, base, "de"),  # same text, other block: must NOT pair cross-block
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(docs, window=3).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got <= exact  # precision 1: only verified-true pairs
    assert (0, 1) in got  # suffix edit (pass 1)
    assert (0, 2) in got  # prefix edit (pass 2 — reversed-word key)
    assert not any(a == 5 or b == 5 for a, b in got)  # block boundary holds


def test_sorted_neighborhood_pass2_is_needed(spark):
    """Ablation: with only the text-order pass (simulated by reversing
    the reversed key's effect — run window=2 and check which pairs the
    full operator owes to pass 2), the prefix-edited pair must come
    from the reversed pass alone: in a corpus where sort order puts
    the prefix-edit FAR from its dup, pass 1 cannot pair them."""
    from pyspark.sql import functions as F, Window as W

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "en"),
        (1, "zz " + base, "en"),  # sorts LAST by text, adjacent reversed
        (2, "bb completely unrelated filler words one two three", "en"),
        (3, "cc another unrelated doc with its own words", "en"),
        (4, "dd third unrelated document text goes here now", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w1 = W.partitionBy("lang").orderBy("text", "doc_id")
    neigh1 = {
        (min(r["doc_id"], r["n"]), max(r["doc_id"], r["n"]))
        for r in docs.select(
            "doc_id", F.lead("doc_id", 1).over(w1).alias("n")
        ).collect()
        if r["n"] is not None
    }
    assert (0, 1) not in neigh1  # pass 1 alone misses it
    from flink_template_spark.operators.dedup import sorted_neighborhood_pairs

    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(docs, window=2).collect()
    }
    assert (0, 1) in got  # the reversed-word pass repairs the miss


def test_sorted_neighborhood_null_block_rows_compared(spark):
    """NULL block keys form their own block — both in the old window
    semantics and in the oracle's PARTITION BY — so two near-dup docs
    with lang NULL must still pair (the rank+d equi-join must be
    null-safe on the block key, not silently drop those rows)."""
    from flink_template_spark.operators.dedup import sorted_neighborhood_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, None),
        (1, base + " mu", None),  # near-dup of 0, same NULL block
        (2, base, "en"),  # same text, real block: no cross-block pair
        (3, "completely different words about nothing shared here", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(docs, window=3).collect()
    }
    assert (0, 1) in got  # NULL-block near-dups are compared
    assert not any(2 in p for p in got)  # NULL block != 'en' block
