"""Graph-centrality queries (link-based quality priors).

``q_pagerank_trade`` runs operators.pagerank over the nation-level
trade graph (customer nation → supplier nation edges derived from
lineitem⋈orders⋈customer⋈supplier): the batch shape of host-level
PageRank quality weighting in web-corpus curation. The DuckDB oracle
replays the SAME fixed number of damped rounds as an unrolled CTE
chain in the same fixed-point integer arithmetic, so ranks match
bit-for-bit (no float summation order anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    QUANT_PR,
    pagerank,
)
from flink_template_spark.memo import SessionLRUMemo
from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table

_PR_ITER = 5

# above-average-volume pairs only: at every SF the raw nation-pair graph
# is near-complete (regular => uniform, bug-hiding ranks); thresholding
# on the mean pair weight keeps the degree sequence irregular, and the
# comparison cnt * n_pairs > total is integer-exact in both engines
_TRADE_EDGES_SQL = """
  SELECT src, dst FROM (
    SELECT src, dst, cnt,
           COUNT(*) OVER () AS n_pairs,
           SUM(cnt) OVER () AS total
    FROM (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             COUNT(*) AS cnt
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    )
  )
  WHERE cnt * n_pairs > total
"""


def _pr_rounds_chain(n_iter: int) -> str:
    """The unrolled damped-iteration CTE chain r1..r{n_iter}; works for
    ANY per-node base vector (uniform PageRank, seed-only TrustRank) —
    the teleport term already reads b.base_q per node."""
    teleport = f"(({DAMP_DEN - DAMP_NUM}) * base_q) // {DAMP_DEN}"
    rounds = []
    for i in range(1, n_iter + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT b.id, b.base_q,
         CAST({teleport}
              + ({DAMP_NUM} * COALESCE(s.s, 0)) // {DAMP_DEN} AS BIGINT)
           AS rank_q
  FROM base b
  LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank_q // d.deg) AS s
    FROM edges e
    JOIN outdeg d ON e.src = d.src
    JOIN r{i - 1} r ON r.id = e.src
    GROUP BY e.dst
  ) s ON b.id = s.id
)"""
        )
    return ",\n".join(rounds)


def _rank_oracle(n_iter: int, base_cte: str) -> str:
    # AS MATERIALIZED: edges is referenced from every round's CTE and
    # from outdeg; DuckDB would otherwise INLINE the 4-way lineitem
    # join once per reference (~15 evaluations for 5 rounds — minutes
    # at sf0.1 instead of seconds)
    return f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
base AS ({base_cte}),
r0 AS (SELECT id, base_q, base_q AS rank_q FROM base),
{_pr_rounds_chain(n_iter)}
SELECT n.n_name, r.rank_q
FROM r{n_iter} r JOIN nation n ON r.id = n.n_nationkey
"""


def _pagerank_oracle(n_iter: int) -> str:
    return _rank_oracle(
        n_iter,
        f"""
  SELECT n_nationkey AS id,
         CAST({QUANT_PR} AS BIGINT)
           // (SELECT COUNT(*) FROM nation) AS base_q
  FROM nation
""",
    )


# All five graph queries derive the same edge table; before r6 each
# paid the ~3-4 s 4-way lineitem join independently (~15 s of the
# extended bench, VERDICT r5 What's-wrong). The memo persists it once
# per (session, sf_dir) — at 100 TB this is the derived edge parquet a
# graph pipeline materializes once and every algorithm reads. The
# result is nation-pair-sized (≤ |nations|²), so the persist is tiny.
_TRADE_EDGES_MEMO = SessionLRUMemo("trade_edges", max_entries=4)


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The directed above-mean-volume trade edge table (src, dst) —
    the Spark dual of _TRADE_EDGES_SQL. Memoized + persisted per
    (applicationId, sf_dir); also spares per-round-action loops (BFS,
    k-core) from rebuilding the 4-way join every round."""
    key = (spark.sparkContext.applicationId, sf_dir)
    return _TRADE_EDGES_MEMO.get_or_build(
        key, lambda: _build_trade_edges(spark, sf_dir)
    )


def _build_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    pair_counts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = pair_counts.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("cnt").alias("total")
    )
    # above-mean pair weight, integer-exact (see _TRADE_EDGES_SQL)
    edges = (
        pair_counts.crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * F.col("n_pairs") > F.col("total"))
        .select("src", "dst")
    )
    # localCheckpoint, not persist: a persisted table keeps its full
    # LINEAGE, and the graph consumers reference the edge table many
    # times (triangle's wedge tree expands it ~30×), so Catalyst
    # re-plans the whole 4-way-join subtree per reference even though
    # execution reads cache — measured 4.0 s warm walls that drop to
    # 1.0 s once the lineage is truncated to the materialized blocks.
    # Eager is fine here: the memo build is already an eager seam.
    return edges.localCheckpoint(eager=True)


@register("q_pagerank_trade", oracle=_pagerank_oracle(_PR_ITER))
def q_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 damped rounds, d=85/100, fixed-point bigint ranks)
    over the cross-nation trade graph. Self-loops (domestic trade) are
    excluded so the graph has real structure. The per-round shuffle is
    the edge⋈rank join on src + the contribution sum on dst — the
    textbook distributed PageRank shape that holds at any edge count;
    here the node table is 25 rows, so the rank/degree sides broadcast.
    """
    nation = load_table(spark, sf_dir, "nation")
    edges = _trade_edges(spark, sf_dir)
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    ranks = pagerank(nodes, edges, n_iter=_PR_ITER)
    return ranks.join(
        nation, ranks.id == nation.n_nationkey
    ).select("n_name", "rank_q")


@register(
    "q_triangle_participation",
    oracle=f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y
  FROM edges WHERE src <> dst
),
tri AS (
  SELECT e1.x AS a, e1.y AS b, e2.y AS c
  FROM und e1
  JOIN und e2 ON e2.x = e1.y
  JOIN und e3 ON e3.x = e1.x AND e3.y = e2.y
),
corners AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT n.n_name, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_triangles
FROM nation n
LEFT JOIN (SELECT v, COUNT(*) AS cnt FROM corners GROUP BY v) c
  ON n.n_nationkey = c.v
""",
)
def q_triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the undirected trade graph
    (operators.triangles — degree-ordered wedge join, each triangle
    found once). The oracle enumerates triangles the brute a<b<c way;
    both sides count the identical triangle SET, so participation
    counts match exactly. Nations in no triangle report 0."""
    from flink_template_spark.operators.triangles import triangles

    nation = load_table(spark, sf_dir, "nation")
    tri = triangles(_trade_edges(spark, sf_dir))
    corners = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return nation.join(
        corners, nation.n_nationkey == corners.v, "left"
    ).select(
        "n_name",
        F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")).alias(
            "n_triangles"
        ),
    )


_KCORE_K = 12
_KCORE_ROUNDS = 5


def _kcore_oracle() -> str:
    from flink_template_spark.operators.kcore import kcore_sql

    return f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
{kcore_sql('edges', _KCORE_K, _KCORE_ROUNDS)},
core AS (
  SELECT a AS node, COUNT(*) AS core_deg
  FROM sym{_KCORE_ROUNDS} GROUP BY a
)
SELECT n.n_name, CAST(c.core_deg AS BIGINT) AS core_deg
FROM core c JOIN nation n ON c.node = n.n_nationkey
ORDER BY n.n_name
"""


@register("q_kcore_trade", oracle=_kcore_oracle())
def q_kcore_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-core of the undirected trade graph (operators.kcore,
    k=12, 5 peel rounds — fixpoint at every test SF, asserted in
    tests/test_graph.py): nations in the densely-trading core with
    their within-core degree. The graph-quality prior of web curation
    — outside-core nodes are leaf chains / halos, the core is the
    community worth boosting. Oracle replays the IDENTICAL peel rounds
    as an unrolled materialized-CTE chain, so survival and degrees
    match exactly."""
    from flink_template_spark.operators.kcore import kcore

    nation = load_table(spark, sf_dir, "nation")
    core = kcore(_trade_edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return (
        core.join(nation, core.node == nation.n_nationkey)
        .select("n_name", F.col("core_deg").cast("bigint").alias("core_deg"))
        .orderBy("n_name")
    )


_TRUST_REGION = "AMERICA"


def _trustrank_oracle() -> str:
    base = f"""
  SELECT n_nationkey AS id,
         CASE WHEN r_name = '{_TRUST_REGION}'
              THEN CAST({QUANT_PR} AS BIGINT) // (
                SELECT COUNT(*) FROM nation n2
                JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                WHERE r2.r_name = '{_TRUST_REGION}')
              ELSE CAST(0 AS BIGINT) END AS base_q
  FROM nation JOIN region ON n_regionkey = r_regionkey
"""
    return _rank_oracle(_PR_ITER, base)


@register("q_trustrank_trade", oracle=_trustrank_oracle())
def q_trustrank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the trade graph (operators.pagerank.trustrank):
    the damped iteration with teleport mass restricted to the trusted
    seed set — here the AMERICA-region nations — so trust decays with trade
    distance from the seeds instead of every node collecting uniform
    teleport mass (the web-curation prior that separates
    seed-reachable content from link-farm halos). Same fixed-point
    bigint arithmetic and unrolled-CTE oracle as q_pagerank_trade;
    only the base vector differs."""
    from flink_template_spark.operators.pagerank import trustrank

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    seeds = (
        nation.join(
            F.broadcast(
                region.filter(F.col("r_name") == _TRUST_REGION)
            ),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("id"))
    )
    ranks = trustrank(nodes, _trade_edges(spark, sf_dir), seeds, n_iter=_PR_ITER)
    return ranks.join(
        nation, ranks.id == nation.n_nationkey
    ).select("n_name", "rank_q")


_BFS_ROUNDS = 6


def _bfs_oracle() -> str:
    from flink_template_spark.operators.bfs import bfs_hops_sql

    return f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
seeds AS (
  SELECT n_nationkey AS id FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_TRUST_REGION}'
),
{bfs_hops_sql('edges', 'seeds', _BFS_ROUNDS)}
SELECT n.n_name, d.hops
FROM d{_BFS_ROUNDS} d JOIN nation n ON d.id = n.n_nationkey
ORDER BY n.n_name
"""


@register("q_trade_hops", oracle=_bfs_oracle())
def q_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed supply-chain hop distance from the AMERICA-region
    nations over the trade graph (operators.bfs — bounded-round
    min-plus relaxation, one edge shuffle + dst-keyed MIN per round).
    The reachability dual of q_trustrank_trade: "k hops from a trusted
    seed" as an exact integer feature. Nations unreachable within 6
    hops are absent; the oracle replays the identical rounds as an
    unrolled CTE chain."""
    from flink_template_spark.operators.bfs import bfs_hops

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    seeds = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == _TRUST_REGION)),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("id"))
    )
    hops = bfs_hops(_trade_edges(spark, sf_dir), seeds, rounds=_BFS_ROUNDS)
    return (
        hops.join(nation, hops.id == nation.n_nationkey)
        .select("n_name", "hops")
        .orderBy("n_name")
    )


_HITS_ITER = 2


def _hits_oracle(n_iter: int) -> str:
    """Unrolled HITS rounds: each half-round is one propagation CTE +
    one 1-row total CTE + one normalization CTE — the exact integer
    arithmetic of operators.hits (Q=1e7; `//` == Spark DIV for the
    non-negative operands here)."""
    q = "CAST(10000000 AS BIGINT)"
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM base)",
        f"h0 AS (SELECT id, {q} // n AS score FROM base CROSS JOIN nn)",
    ]
    prev_hub = "h0"
    for i in range(1, n_iter + 1):
        for tag, frm, to, src_cte in (
            (f"a{i}", "src", "dst", prev_hub),
            (f"h{i}", "dst", "src", f"a{i}"),
        ):
            parts.append(
                f"""{tag}r AS (
  SELECT e.{to} AS id, SUM(s.score) AS raw
  FROM edges e JOIN {src_cte} s ON s.id = e.{frm}
  GROUP BY e.{to}
)"""
            )
            parts.append(f"{tag}t AS (SELECT SUM(raw) AS t FROM {tag}r)")
            parts.append(
                f"""{tag} AS (
  SELECT b.id,
         CAST(COALESCE((r.raw * {q}) // t.t, 0) AS BIGINT) AS score
  FROM base b LEFT JOIN {tag}r r ON b.id = r.id CROSS JOIN {tag}t t
)"""
            )
        prev_hub = f"h{i}"
    chain = ",\n".join(parts)
    return f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
base AS (SELECT n_nationkey AS id FROM nation),
{chain}
SELECT n.n_name, h.score AS hub_q, a.score AS auth_q
FROM h{n_iter} h
JOIN a{n_iter} a ON h.id = a.id
JOIN nation n ON h.id = n.n_nationkey
"""


@register("q_hits_trade", oracle=_hits_oracle(_HITS_ITER))
def q_hits_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the trade graph (operators.hits —
    sum-normalized integer fixed-point, 2 full rounds). The directed
    complement to q_pagerank_trade: a nation that BUYS from many
    well-connected exporters scores as a hub, a nation many hubs buy
    FROM scores as an authority — the two sides of the link-quality
    prior a web-corpus curation stack wants (PageRank alone conflates
    them). The oracle replays the identical rounds as an unrolled CTE
    chain; every number is a bigint, so the match is bit-exact."""
    from flink_template_spark.operators.hits import hits

    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    scores = hits(nodes, _trade_edges(spark, sf_dir), n_iter=_HITS_ITER)
    return scores.join(nation, scores.id == nation.n_nationkey).select(
        "n_name", "hub_q", "auth_q"
    )


_LP_ITER = 3


def _lp_chain_cte(n_iter: int) -> str:
    """The labelprop round chain WITHOUT the final rollup — shared by
    q_labelprop_communities' oracle and the modularity oracle."""
    rounds = []
    for i in range(1, n_iter + 1):
        prev = "l0" if i == 1 else f"l{i - 1}"
        rounds.append(f"""
l{i} AS MATERIALIZED (
  SELECT n.id,
    COALESCE((
      SELECT lbl FROM (
        SELECT p.label AS lbl, COUNT(*) AS c
        FROM sym e JOIN {prev} p ON p.id = e.dst
        WHERE e.src = n.id
        GROUP BY p.label
      ) t ORDER BY c DESC, lbl LIMIT 1
    ), n.id) AS label
  FROM nodes n
)""")
    return ",".join(rounds)


def _labelprop_sym_and_labels(spark, sf_dir):
    """Symmetrized edge table + the final synchronous-LPA labeling —
    the SHARED plan-side dual of _lp_chain_cte, used by BOTH
    q_labelprop_communities and q_graph_modularity so a tie-break or
    round-count tweak can never desynchronize the community ids one
    query emits from the partition the other scores."""
    from pyspark.sql import Window as W

    edges = _trade_edges(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id")
    )
    labels = nodes.select("id", F.col("id").alias("label"))
    warg = W.partitionBy("id").orderBy(F.desc("c"), "lbl")
    for _ in range(_LP_ITER):
        neigh = (
            sym.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("lbl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            neigh.withColumn("rk", F.row_number().over(warg))
            .filter(F.col("rk") == 1)
            .select("id", F.col("lbl").alias("new_label"))
        )
        labels = nodes.join(best, "id", "left").select(
            "id",
            F.coalesce(F.col("new_label"), F.col("id")).alias("label"),
        )
    return sym, labels


def _labelprop_oracle(n_iter: int) -> str:
    return f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
sym AS MATERIALIZED (
  SELECT src, dst FROM edges
  UNION
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT n_nationkey AS id FROM nation),
l0 AS (SELECT id, id AS label FROM nodes),
{_lp_chain_cte(n_iter)}
SELECT CAST(l.label AS BIGINT) AS community,
  CAST(COUNT(*) AS BIGINT) AS n_members,
  CAST(MIN(l.id) AS BIGINT) AS min_member
FROM l{n_iter} l
GROUP BY l.label
ORDER BY community
"""


@register("q_labelprop_communities", oracle=_labelprop_oracle(_LP_ITER))
def q_labelprop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation community detection over the
    (symmetrized) trade graph: every node starts as its own label;
    each round it adopts the most frequent label among its neighbors
    (ties broken by the smaller label; isolated nodes keep their own)
    for a FIXED {_LP_ITER} rounds — the deterministic variant of LPA
    used as a host-clustering prior in corpus curation (communities of
    mutually-linking sources get one quality/mixture decision).

    Determinism: classic async LPA is run-order dependent; the
    synchronous round with the (count DESC, label ASC) argmax is a
    pure function of the previous labeling, so both engines replay the
    identical sequence — the oracle unrolls the same rounds as CTEs.

    Scale shape: per round, one edge⋈label equi-join shuffle and one
    (node, label)-keyed count with a node-partitioned argmax window —
    the same edge-proportional round cost as the PageRank family; the
    edge table is the memoized session build (no re-derivation)."""
    _, labels = _labelprop_sym_and_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("id").cast("bigint").alias("min_member"),
        )
        .select(
            F.col("community").cast("bigint").alias("community"),
            "n_members",
            "min_member",
        )
        .orderBy("community")
    )


@register(
    "q_common_neighbor_sim",
    oracle=f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
common AS (
  SELECT a.src AS id_a, b.src AS id_b, COUNT(*) AS n_common
  FROM edges a JOIN edges b ON a.dst = b.dst
  WHERE a.src < b.src
  GROUP BY 1, 2
)
SELECT
  na.n_name AS nation_a,
  nb.n_name AS nation_b,
  CAST(n_common AS BIGINT) AS n_common,
  CAST(da.d + db.d - n_common AS BIGINT) AS n_union,
  ROUND(CAST(n_common AS DOUBLE) / CAST(da.d + db.d - n_common AS DOUBLE), 6)
    AS jaccard
FROM common
JOIN deg da ON common.id_a = da.src
JOIN deg db ON common.id_b = db.src
JOIN nation na ON common.id_a = na.n_nationkey
JOIN nation nb ON common.id_b = nb.n_nationkey
ORDER BY jaccard DESC, nation_a, nation_b
LIMIT 15
""",
)
def q_common_neighbor_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural node similarity on the trade graph: Jaccard overlap
    of two nations' out-neighbor sets (common trade destinations /
    union), top-15 pairs — the common-neighbors link-prediction prior
    (who is likely to START trading?) next to the connectivity family
    (PageRank/HITS/k-core).

    Scale shape: pairs materialize ONLY through the shared-destination
    equi-join on the memoized edge table (never nation×nation); on a
    billion-edge graph the same join keys by dst with the usual
    high-degree-hub salting caveat. Jaccard is one double division of
    exact integer counts; top-15 is TakeOrderedAndProject."""
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select(F.col("src").alias("id_a"), "dst")
    b = edges.select(F.col("src").alias("id_b"), "dst")
    common = (
        a.join(b, "dst")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("src").alias("id_a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("src").alias("id_b"), F.col("d").alias("d_b"))
    na = nation.select(
        F.col("n_nationkey").alias("id_a"), F.col("n_name").alias("nation_a")
    )
    nb = nation.select(
        F.col("n_nationkey").alias("id_b"), F.col("n_name").alias("nation_b")
    )
    union_sz = F.col("d_a") + F.col("d_b") - F.col("n_common")
    return (
        common.join(F.broadcast(da), "id_a")
        .join(F.broadcast(db), "id_b")
        .join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "nation_a",
            "nation_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            union_sz.cast("bigint").alias("n_union"),
            F.round(
                F.col("n_common").cast("double") / union_sz.cast("double"), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "nation_a", "nation_b")
        .limit(15)
    )


@register(
    "q_graph_assortativity",
    oracle=f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
od AS (SELECT src, COUNT(*) AS outd FROM edges GROUP BY src),
idg AS (SELECT dst, COUNT(*) AS ind FROM edges GROUP BY dst),
xy AS (
  SELECT outd AS x, ind AS y
  FROM edges
  JOIN od ON edges.src = od.src
  JOIN idg ON edges.dst = idg.dst
),
s AS (
  SELECT COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM xy
)
SELECT
  CAST(m AS BIGINT) AS n_edges,
  CASE WHEN m * sxx - sx * sx <= 0 OR m * syy - sy * sy <= 0
       THEN CAST(NULL AS DOUBLE)
       ELSE ROUND(
         CAST(m * sxy - sx * sy AS DOUBLE)
         / (SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
            * SQRT(CAST(m * syy - sy * sy AS DOUBLE))), 6)
  END AS assortativity
FROM s
""",
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the trade graph: the Pearson
    correlation, over directed edges, of the source's out-degree with
    the destination's in-degree — the hub-wiring diagnostic next to
    the connectivity family (assortative > 0: hubs trade with hubs;
    disassortative < 0: hubs fan out to the periphery — the shape
    that decides whether hub-targeted partitioning or salting helps).

    Exactness: all six sufficient sums are exact BIGINT arithmetic on
    integer degrees (no float accumulation-order drift at any scale
    below ~2^63 edge-degree products); the single final correlation
    divides/sqrts in one fixed dag, 6-dp, with a NULL degenerate
    guard (zero variance — e.g. a perfectly regular graph — is
    undefined, not a divide-by-zero abort under ANSI).

    Scale shape: serves off the memoized edge table; both degree
    tables are hash aggs of it (≤ |nations| rows, broadcast into the
    edge join); the correlation is a 1-row reduction."""
    from flink_template_spark.functions.stats import pearson_terms, suff_sums

    edges = _trade_edges(spark, sf_dir)
    od = edges.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    idg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    xy = edges.join(F.broadcast(od), "src").join(F.broadcast(idg), "dst")
    s = suff_sums(xy)
    num, dxx, dyy = pearson_terms()
    return s.select(
        F.col("m").cast("bigint").alias("n_edges"),
        F.when((dxx <= 0) | (dyy <= 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                num.cast("double")
                / (F.sqrt(dxx.cast("double")) * F.sqrt(dyy.cast("double"))),
                6,
            )
        )
        .alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Modularity of the label-propagation communities (round 11)
# ---------------------------------------------------------------------------


@register(
    "q_graph_modularity",
    oracle=f"""
WITH edges AS MATERIALIZED ({_TRADE_EDGES_SQL}),
sym AS MATERIALIZED (
  SELECT src, dst FROM edges
  UNION
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT n_nationkey AS id FROM nation),
l0 AS (SELECT id, id AS label FROM nodes),
{_lp_chain_cte(_LP_ITER)},
labeled AS MATERIALIZED (SELECT id, label FROM l{_LP_ITER}),
m2 AS (SELECT COUNT(*) AS arcs FROM sym),  -- 2m (each edge = 2 arcs)
deg AS (
  SELECT l.label, COUNT(*) AS d_c
  FROM sym e JOIN labeled l ON l.id = e.src
  GROUP BY l.label
),
internal AS (
  SELECT la.label, COUNT(*) AS a_c
  FROM sym e
  JOIN labeled la ON la.id = e.src
  JOIN labeled lb ON lb.id = e.dst
  WHERE la.label = lb.label
  GROUP BY la.label
),
terms AS (
  SELECT d.label,
    COALESCE(i.a_c, 0) AS a_c,
    d.d_c,
    CAST(ROUND(
      ((CAST(COALESCE(i.a_c, 0) AS DOUBLE) / arcs)
        - (CAST(d.d_c AS DOUBLE) / arcs) * (CAST(d.d_c AS DOUBLE) / arcs))
      * 1000000000, 0) AS BIGINT) AS term_q
  FROM deg d LEFT JOIN internal i ON d.label = i.label
  CROSS JOIN m2
),
q AS (SELECT SUM(term_q) AS q_sum FROM terms)
SELECT CAST(t.label AS BIGINT) AS community,
  CAST(t.a_c AS BIGINT) AS internal_arcs,
  CAST(t.d_c AS BIGINT) AS degree_sum,
  ROUND(CAST(t.term_q AS DOUBLE) / 1000000000.0, 6) AS term,
  ROUND(CAST(q.q_sum AS DOUBLE) / 1000000000.0, 6) AS modularity_q
FROM terms t CROSS JOIN q
ORDER BY community
""",
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities over the
    symmetrized trade graph: Q = Σ_c [aᶜ/2m − (dᶜ/2m)²] with aᶜ =
    within-community arcs and dᶜ = community degree sum (arc counts, so
    2m = |sym|) — the quality readout that tells a curation stack
    whether its host-community prior actually found structure (Q ≈ 0 =
    no better than random, Q ≳ 0.3 = real communities worth per-
    community mixture decisions).

    Exactness: the labeling replays q_labelprop_communities' exact
    synchronous rounds (same CTE chain, shared via _lp_chain_cte);
    aᶜ/dᶜ/2m are exact integers; each community's term is ONE double
    expression quantized ROUND(x·1e9, 0) → bigint before the
    community-level sum (round-THEN-cast: Spark's double→bigint cast
    truncates while DuckDB's rounds, so the multiply-round-0 form is
    the only engine-identical one; terms ∈ [−1, 1], so ×1e9 fits int64
    up to ~9e9 communities — partition-order-free).

    Scale shape: two edge⋈label equi-join shuffles (degree and
    internal-arc counts) over the memoized edge table after the fixed
    labelprop rounds; the term table is |communities|-sized, its sum a
    1-row broadcast."""
    sym, labels = _labelprop_sym_and_labels(spark, sf_dir)
    labeled = labels.localCheckpoint(eager=False)  # three consumers
    m2 = sym.agg(F.count(F.lit(1)).alias("arcs"))
    deg = (
        sym.join(labeled.select(F.col("id").alias("src"), "label"), "src")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    internal = (
        sym.join(
            labeled.select(F.col("id").alias("src"), F.col("label").alias("la")),
            "src",
        )
        .join(
            labeled.select(F.col("id").alias("dst"), F.col("label").alias("lb")),
            "dst",
        )
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("a_c"))
    )
    arcs = F.col("arcs").cast("double")
    terms = (
        deg.join(internal, "label", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            F.coalesce(F.col("a_c"), F.lit(0)).alias("a_c"),
            "d_c",
            F.round(
                (
                    F.coalesce(F.col("a_c"), F.lit(0)).cast("double") / arcs
                    - (F.col("d_c").cast("double") / arcs)
                    * (F.col("d_c").cast("double") / arcs)
                )
                * 1000000000,
                0,
            )
            .cast("bigint")
            .alias("term_q"),
        )
        .localCheckpoint(eager=False)  # two consumers: rows + Q sum
    )
    qsum = terms.agg(F.sum("term_q").alias("q_sum"))
    return (
        terms.crossJoin(F.broadcast(qsum))
        .select(
            F.col("label").cast("bigint").alias("community"),
            F.col("a_c").cast("bigint").alias("internal_arcs"),
            F.col("d_c").cast("bigint").alias("degree_sum"),
            F.round(F.col("term_q").cast("double") / 1000000000.0, 6).alias(
                "term"
            ),
            F.round(F.col("q_sum").cast("double") / 1000000000.0, 6).alias(
                "modularity_q"
            ),
        )
        .orderBy("community")
    )
