"""Bounded-round BFS: hop distances from a source set.

The min-plus dual of operators.pagerank's sum-times iteration and the
third member of the bounded-round graph family (pagerank/trustrank =
weighted mass, kcore = peeling, this = reachability/distance). Web-
curation use: crawl-depth / link-distance-from-seeds as a quality
feature, and "within k hops of a trusted hub" as a cheap TrustRank
approximation with exact semantics.

Each round relaxes every edge once: dist'(v) = min(dist(v),
min over edges (u, v) of dist(u) + 1) — a join on src + a dst-keyed
MIN aggregation, the same one-shuffle-per-round shape as PageRank,
with map-side partial MINs. Rounds are FIXED: after ``rounds`` rounds
the result is exact for every node within that many hops and NULL
(unreached) beyond — the truncation is the documented semantics, not
an approximation, and the DuckDB oracle replays the identical rounds
as an unrolled CTE chain. Integer arithmetic only; nothing to round.

``localCheckpoint`` per round truncates lineage (the
operators.components / operators.kcore trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, hops): directed hop distance from the nearest source, for
    every node reachable within ``rounds`` hops (sources themselves at
    0). Unreached nodes are absent from the result."""
    # checkpoint the edge table ONCE: unlike pagerank (one lazy plan,
    # ReuseExchange dedupes the repeated edge subtree within a single
    # job), the per-round localCheckpoints here run SEPARATE jobs, and
    # stage reuse does not span jobs — without this, a derived edge
    # table (e.g. the 4-way trade join) is rebuilt every round
    # (measured 5.0 -> 3.5 s warm at sf0.1 for 6 rounds; the residual
    # is per-round job overhead plus the one-time build)
    edges = edges.localCheckpoint()
    dist = sources.select(
        F.col(id_col).alias("id"), F.lit(0).cast("bigint").alias("hops")
    ).localCheckpoint()
    for _ in range(rounds):
        relaxed = (
            edges.join(dist.select(F.col("id").alias(src_col), "hops"), src_col)
            .select(
                F.col(dst_col).alias("id"),
                (F.col("hops") + F.lit(1)).alias("hops"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
    return dist


def bfs_hops_sql(
    edges_cte: str, sources_cte: str, rounds: int
) -> str:
    """DuckDB oracle: the identical relaxation rounds unrolled. Yields
    CTEs d0..d{rounds}; ``edges_cte`` provides (src, dst), and
    ``sources_cte`` provides (id). Every round is MATERIALIZED (each is
    referenced twice: carry-over + relaxation)."""
    chain = [
        f"d0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS hops FROM {sources_cte})"
    ]
    for i in range(1, rounds + 1):
        chain.append(
            f"""d{i} AS MATERIALIZED (
  SELECT id, MIN(hops) AS hops FROM (
    SELECT id, hops FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS id, r.hops + 1 AS hops
    FROM {edges_cte} e JOIN d{i - 1} r ON e.src = r.id
  ) GROUP BY id
)"""
        )
    return ",\n".join(chain)
