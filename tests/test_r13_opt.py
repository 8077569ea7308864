"""Round-13 optimization tests: contracts and guards added this round.

- _plane_dot's fixed-width contract (VERDICT r12 #7): an off-width
  vector yields NULL by pinned contract, not by zip_with accident.
- facility_location_greedy's broadcast guard (VERDICT r12 #6): above
  BROADCAST_COV_MAX_ROWS the loop degrades to the shuffle join with
  identical picks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_plane_dot_fixed_width_contract(spark):
    """The LSH module contract is dim == PLANE_STRIDE (64). _plane_dot
    zip_withs the vector against a 64-wide literal weight array, so an
    off-width vector NULL-pads and the fold returns NULL — pin that as
    the explicit contract (off-width input => NULL, never a partial
    dot), for both the HOF form and the Arrow kernel."""
    from flink_template_spark.functions.vector import plane_dots_arrow
    from flink_template_spark.operators.similarity import (
        PLANE_STRIDE,
        _plane_dot,
        _plane_weights,
    )

    full = [float(i % 7) - 3.0 for i in range(PLANE_STRIDE)]
    short = full[: PLANE_STRIDE - 1]
    long = full + [1.0]
    df = spark.createDataFrame(
        [(1, full), (2, short), (3, long), (4, None)],
        "id long, v array<double>",
    )
    weights = [_plane_weights(j) for j in range(4)]
    rows = {
        r.id: r
        for r in df.select(
            "id",
            _plane_dot(F.col("v"), 0).alias("hof"),
            plane_dots_arrow(F.col("v"), weights).alias("arrow"),
        ).collect()
    }
    # in-contract width: both forms produce a real dot
    assert rows[1].hof is not None
    assert rows[1].arrow is not None and rows[1].arrow[0] is not None
    # off-width (short, long) and NULL vectors: NULL, never a partial dot
    for rid in (2, 3, 4):
        assert rows[rid].hof is None, f"id={rid} HOF broke the width contract"
        assert rows[rid].arrow is None, (
            f"id={rid} Arrow kernel broke the width contract"
        )


def test_shingle_rows_zip_matches_window_lead(spark, sf_dir):
    """The map-side arrays_zip shingle build must emit row-identical
    output to the window-lead formulation it replaced (kept in-tree as
    builder="window" for the two call sites that measured faster on
    it) — on the real fixture and on adversarial docs (short docs,
    runs of spaces / empty tokens, single token, empty string, NULL
    text)."""
    from flink_template_spark.operators.dedup import shingle_rows
    from flink_template_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    adversarial = spark.createDataFrame(
        [
            (9001, "one two three four five"),
            (9002, "a  b c"),       # empty token from the double space
            (9003, "solo"),
            (9004, ""),
            (9005, None),
            (9006, "x y"),          # n-1 tokens for n=3
            (9007, "r r r r"),      # repeated tokens -> duplicate shingles
        ],
        "doc_id long, text string",
    )
    for src in (docs, adversarial):
        for n in (1, 3, 5):
            for distinct in (True, False):
                for keep_pos in (False, True):
                    if n == 1:
                        # both builders share the unchanged n=1 branch
                        continue
                    got = shingle_rows(
                        src, n, distinct=distinct, keep_pos=keep_pos
                    )
                    ref = shingle_rows(
                        src,
                        n,
                        distinct=distinct,
                        keep_pos=keep_pos,
                        builder="window",
                    )
                    cols = got.columns
                    g = sorted(map(tuple, got.select(cols).collect()))
                    r = sorted(map(tuple, ref.select(cols).collect()))
                    assert g == r, (
                        f"mismatch n={n} distinct={distinct} "
                        f"keep_pos={keep_pos} ({len(g)} vs {len(r)} rows)"
                    )


def test_minhash_instance_min_matches_distinct_min(spark, sf_dir):
    """minhash_signatures' distinct=False shingle feed must produce the
    identical signature table as a min over the DISTINCT shingle set
    (MIN is duplicate-insensitive)."""
    from flink_template_spark.functions.hashing import (
        NUM_HASHES,
        md5int_spark,
        minhash_expr,
    )
    from flink_template_spark.operators.dedup import (
        minhash_signatures,
        shingle_rows,
    )
    from flink_template_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    got = minhash_signatures(docs)
    sh = shingle_rows(docs, 3, distinct=True).withColumn(
        "h", F.expr(md5int_spark("shingle"))
    )
    ref = sh.groupBy("doc_id").agg(
        *[
            F.min(F.expr(minhash_expr(i, "h"))).alias(f"mh_{i}")
            for i in range(NUM_HASHES)
        ]
    )
    g = sorted(map(tuple, got.collect()))
    r = sorted(map(tuple, ref.collect()))
    assert g == r and len(g) > 0


def test_coreset_broadcast_guard_fallback_identical(spark, monkeypatch):
    """Above BROADCAST_COV_MAX_ROWS the greedy loop must fall back to
    the shuffle join and still produce the identical pick sequence."""
    from flink_template_spark.operators import coreset

    data = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.5]),
        (5, [0.0, 0.0, 0.4, 1.0]),
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    picks_bcast = coreset.facility_location_greedy(df, k=3)
    monkeypatch.setattr(coreset, "BROADCAST_COV_MAX_ROWS", 2)
    picks_shuffle = coreset.facility_location_greedy(df, k=3)
    assert picks_bcast == picks_shuffle
    assert [p["round"] for p in picks_bcast] == [1, 2, 3]
