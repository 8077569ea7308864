"""Connected components over a pair-edge list (near-dup clustering).

The training-data use: near-dup pair emitters (MinHash-LSH, SimHash,
Jaccard — ``operators.dedup``) produce EDGES; deduplication needs
CLUSTERS (transitive closure) plus one canonical keeper per cluster.

Algorithm: iterative min-label propagation on DataFrames. Every node
starts labeled with itself; each round, a node adopts the minimum label
among itself and its neighbors; stop when a round changes nothing. The
result assigns every node the minimum node-id reachable from it — a
deterministic, engine-independent definition, which is what makes the
DuckDB recursive-CTE oracle possible.

Scale notes (100 TB):
- rounds = graph diameter. Near-dup graphs are dense little clumps
  (diameter 2-4), so 3-5 rounds in practice; for adversarial long-chain
  graphs switch to alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond"), which converges in
  O(log n) rounds with the same per-round join shape.
- each round is one shuffle-join (labels ⋈ edges on node) + one
  groupBy(node).min — both partition on the node key, so AQE reuses the
  exchange layout.
- ``localCheckpoint`` per round truncates the lineage chain; without it
  the plan doubles every iteration and the driver OOMs planning round ~20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) with component = min node-id reachable.

    ``nodes``: one column ``node_col`` (singletons keep themselves).
    ``edges``: undirected pairs in ``src_col``/``dst_col``.
    """
    sym = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
    ).persist()
    sym.count()

    labels = (
        nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, labels.node == nbr_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__chg"),
            )
        )
        updated = updated.localCheckpoint()
        changed = updated.filter(F.col("__chg")).limit(1).count()
        labels = updated.drop("__chg")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def near_dup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster docs by near-dup pair edges; flag the canonical keeper.

    Output: (doc_id, component, cluster_size, is_keeper) — keeper is the
    min doc_id of its component, the row a dedup pipeline retains.
    """
    cc = connected_components(
        docs.select(F.col(id_col).alias("node")), pairs
    )
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias(id_col),
            "component",
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_keeper"),
        )
    )
