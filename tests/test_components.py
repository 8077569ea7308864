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
