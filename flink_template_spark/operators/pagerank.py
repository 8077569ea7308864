"""Distributed PageRank in integer fixed-point arithmetic.

Link-graph centrality is a standard quality prior for web-scale
training-data curation (host-level PageRank is one of the quality
signals in the Common Crawl-derived corpora literature); this is the
batch operator for it, expressed as pure DataFrame joins so every
iteration is one edge-join shuffle + one in-neighbor aggregation —
the textbook distributed formulation.

All arithmetic is INTEGER (ranks are fixed-point bigints scaled by
``QUANT_PR``; per-edge contributions and the damping mix use integral
division), so partial-aggregation order can't perturb results and a
DuckDB oracle replaying the same unrolled rounds matches bit-for-bit —
the same determinism discipline as operators.kmeans / operators.pq.

Semantics: the classic damped iteration
``r'(v) = (1-d)/N + d * sum_{u->v} r(u)/outdeg(u)`` with d = 85/100,
a FIXED iteration count, and no dangling-mass redistribution (a sink
node's rank leaks; acceptable for a fixed-round quality prior and kept
deliberately so the replayed oracle stays one join per round).

Scale shape (100 TB): ``edges`` is the big table — each round shuffles
it once on ``src`` (co-partitioned with the rank table, so consecutive
rounds reuse the same hash partitioning) and aggregates contributions
on ``dst`` with map-side partials. The rank and degree tables are
node-sized (broadcast-able when the node set is small, as in the
nation-graph query). Iterations are a bounded driver loop building ONE
lazy plan — Spark's ReuseExchange dedupes the repeated edge-build
subtree, and at lake scale you'd materialize ``edges`` once up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_PR = 10**12
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, rank_q) after ``n_iter`` damped rounds; rank_q is the
    fixed-point bigint rank (scale ``QUANT_PR``), exact and
    engine-portable. ``edges`` must be distinct (src, dst) pairs with
    both endpoints in ``nodes``."""
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    # base_q rides along as a column: N stays a lazy scalar (no eager
    # count at plan-construction time), broadcast as a 1-row cross join
    base = nodes.crossJoin(F.broadcast(n_nodes)).select(
        F.col(id_col).alias("id"),
        F.expr(f"CAST({QUANT_PR} AS BIGINT) DIV n_nodes").alias("base_q"),
    )
    return _damped_rounds(base, edges, n_iter, src_col, dst_col)


def trustrank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """TrustRank (Gyöngyi-Garcia-Molina-Pedersen '04): PageRank with
    the teleport mass restricted to a TRUSTED SEED set — the
    quality-propagation prior of web curation (trust flows out from
    vetted hosts; link-spam farms with no seed-reachable in-path decay
    to rank ≈ 0 instead of collecting uniform teleport mass). Same
    fixed-point integer iteration as ``pagerank`` (same oracle
    replayability), only the base vector differs: QUANT_PR/|seeds| on
    seed nodes, 0 elsewhere. ``seeds`` is a 1-column DataFrame of
    ``id_col`` values (a subset of ``nodes``); duplicates are
    collapsed — a seed list built from a fanning join must not fan the
    base vector out (duplicated output rows) or dilute the per-seed
    teleport mass (n_seeds counting copies)."""
    uniq = seeds.select(F.col(id_col).alias("id")).distinct()
    n_seeds = uniq.agg(F.count(F.lit(1)).alias("n_seeds"))
    seed_ids = uniq.select("id", F.lit(1).alias("__seed"))
    base = (
        nodes.select(F.col(id_col).alias("id"))
        .join(seed_ids, "id", "left")
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "id",
            F.when(
                F.col("__seed").isNotNull(),
                F.expr(f"CAST({QUANT_PR} AS BIGINT) DIV n_seeds"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("base_q"),
        )
    )
    return _damped_rounds(base, edges, n_iter, src_col, dst_col)


def _damped_rounds(
    base: DataFrame, edges: DataFrame, n_iter: int, src_col: str, dst_col: str
) -> DataFrame:
    """The shared fixed-point loop: (id, base_q) in, (id, rank_q) out
    after ``n_iter`` rounds of the damped integer iteration."""
    outdeg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("deg"))
    edges_d = edges.join(outdeg, src_col)

    rank = base.select("id", "base_q", F.col("base_q").alias("rank_q"))
    for _ in range(n_iter):
        contrib = edges_d.join(
            rank.select(F.col("id").alias(src_col), "rank_q"), src_col
        ).select(
            F.col(dst_col).alias("id"),
            F.expr("rank_q DIV deg").alias("c"),
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        rank = (
            base.join(sums, "id", "left")
            .select(
                "id",
                "base_q",
                (
                    F.expr(f"({DAMP_DEN - DAMP_NUM} * base_q) DIV {DAMP_DEN}")
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" DIV {DAMP_DEN}"
                    )
                ).alias("rank_q"),
            )
        )
    return rank.select("id", "rank_q")
