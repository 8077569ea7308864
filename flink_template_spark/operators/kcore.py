"""k-core decomposition by iterative peeling.

The k-core is the maximal subgraph in which every node has degree >= k
— the standard graph-quality prior for separating densely-linked
communities from link-spam halos and orphan pages in web-corpus
curation (a page outside any 2-core is a leaf chain; high-k cores are
tight clusters worth boosting or auditing).

Peeling (Matula & Beck '83, the BSP form of Montresor et al. '13):
repeatedly delete every node whose CURRENT degree is below k; what
survives is exactly the k-core. Each round is one degree aggregation
plus two semi-joins restricting edge endpoints to survivors — plain
hash-partitioned shuffles on the node key, no per-node state, so a
round costs the same as any edge-table groupBy at 100 TB. Rounds are
FIXED (``rounds``), not run-to-fixpoint: a bounded, replayable plan —
the DuckDB oracle unrolls the identical rounds as a CTE chain and
matches bit-for-bit (the same design as operators.pagerank). Peeling
converges in at most diameter-ish rounds on real graphs (long chains
are the worst case); callers size ``rounds`` to their graph and verify
the fixpoint with ``kcore_converged``-style checks in tests — an
under-sized round budget yields a SUPERSET of the k-core (some
not-yet-peeled nodes), never a wrong deletion.

``localCheckpoint`` per round truncates the lineage chain, the same
trade as operators.components (GC-scoped blocks, recompute-on-loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Undirected simple adjacency: both directions of every edge,
    duplicates and self-loops dropped. (a, b) columns."""
    a_b = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    b_a = edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    return a_b.unionAll(b_a).filter(F.col("a") != F.col("b")).distinct()


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, core_deg): nodes surviving ``rounds`` peels at threshold
    ``k``, with their degree inside the surviving subgraph. With
    ``rounds`` >= the graph's peel depth this IS the k-core."""
    adj = symmetrize(edges, src_col, dst_col).localCheckpoint()
    for _ in range(rounds):
        deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("a")
        adj = (
            adj.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    return (
        adj.groupBy("a")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .select(F.col("a").alias("node"), "core_deg")
    )


def kcore_sql(edges_cte: str, k: int, rounds: int) -> str:
    """DuckDB oracle: the identical peel rounds unrolled as a CTE
    chain. ``edges_cte`` must provide (src, dst) directed rows; every
    round CTE is MATERIALIZED because it is referenced three times
    (edge scan + both endpoint restrictions) — DuckDB would otherwise
    inline the whole chain once per reference (the PageRank lesson)."""
    chain = [
        f"""sym0 AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT src AS a, dst AS b FROM {edges_cte}
    UNION
    SELECT dst AS a, src AS b FROM {edges_cte}
  ) WHERE a <> b
)"""
    ]
    for i in range(1, rounds + 1):
        chain.append(
            f"""sym{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM sym{i - 1} e
  JOIN (SELECT a FROM sym{i - 1} GROUP BY a HAVING COUNT(*) >= {k}) ka
    ON e.a = ka.a
  JOIN (SELECT a FROM sym{i - 1} GROUP BY a HAVING COUNT(*) >= {k}) kb
    ON e.b = kb.a
)"""
        )
    return ",\n".join(chain)
