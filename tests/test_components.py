"""connected_components: convergence on multi-hop chains, singletons,
and keeper selection — independent of the corpus-level oracle test."""

from __future__ import annotations

from flink_template_spark.operators.components import (
    connected_components,
    near_dup_components,
)


def test_chain_propagates_beyond_one_hop(spark):
    # 1-2-3-4-5 chain: min label needs 4 rounds to reach node 5.
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["node"])
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7}


def test_near_dup_components_keeper_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in [10, 20, 30, 40]], ["doc_id"])
    pairs = spark.createDataFrame([(20, 30), (30, 40)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in near_dup_components(docs, pairs).collect()}
    assert rows[10]["cluster_size"] == 1 and rows[10]["is_keeper"]
    for d in (20, 30, 40):
        assert rows[d]["component"] == 20
        assert rows[d]["cluster_size"] == 3
    assert rows[20]["is_keeper"] and not rows[30]["is_keeper"]


def test_leakage_safe_split_clusters_never_straddle(spark, monkeypatch):
    """The property the operator exists for: every near-dup cluster
    lands in exactly one split, the naive per-doc split DOES straddle
    on the same data (the leak is real, not hypothetical), and
    singleton docs keep their naive assignment (component == doc_id)."""
    import flink_template_spark.plans.text_dedup as TD
    from flink_template_spark.operators.dedup import ngram_jaccard_pairs
    from flink_template_spark.operators.components import near_dup_components
    from flink_template_spark.plans.datapipe import split_of

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    did = 0
    # 30 clusters of 2 near-dups each, ids spread so hashes differ
    for c in range(30):
        rows.append((did, f"{base} c{c}"))
        rows.append((did + 1, f"{base} c{c} extra"))
        did += 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    comp = near_dup_components(docs, pairs).select("doc_id", "component")
    tagged = comp.select(
        "doc_id",
        "component",
        split_of("component").alias("split"),
        split_of("doc_id").alias("naive"),
    ).collect()
    by_comp: dict = {}
    naive_by_comp: dict = {}
    for r in tagged:
        by_comp.setdefault(r["component"], set()).add(r["split"])
        naive_by_comp.setdefault(r["component"], set()).add(r["naive"])
    assert all(len(s) == 1 for s in by_comp.values())  # never straddles
    assert any(len(s) > 1 for s in naive_by_comp.values())  # naive leaks
