"""Distributed triangle enumeration with degree-ordered orientation.

Triangle / clustering-coefficient structure is a standard link-spam and
community signal in web-graph curation; this is the batch operator,
expressed as two equi-joins (the MapReduce-era formulation of Suri &
Vassilvitskii, WWW'11 "Counting triangles and the curse of the last
reducer").

The scalability trick is the ORIENTATION: every undirected edge is
directed from its lower endpoint to its higher endpoint under the
(degree, id) total order. Each triangle then appears exactly once (the
orientation is acyclic), and — the point — a node's OUT-degree is
bounded by O(sqrt(m)) regardless of its real degree, so the wedge join
(pairs of out-neighbors) never explodes on a celebrity node. Without
it, one degree-10^7 hub contributes 10^14 wedges; with it, the hub's
edges all point INTO it and contribute none.

Everything is joins + aggregations on (src, dst) pairs — no state, no
iteration — so the plan is a straight line of hash-partitioned
shuffles Catalyst handles like any other join tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangles(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(a, b, c): one row per triangle of the UNDIRECTED simple graph
    induced by ``edges`` (direction and duplicates ignored, self-loops
    dropped); corners are ordered a < b < c by node id."""
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("x"),
            F.greatest(src_col, dst_col).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    deg = (
        und.select(F.col("x").alias("v"))
        .unionAll(und.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("v").alias("y"), F.col("deg").alias("deg_y"))
    keyed = und.join(dx, "x").join(dy, "y")
    x_first = F.struct("deg_x", "x") < F.struct("deg_y", "y")
    oriented = keyed.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(x_first, F.col("deg_y")).otherwise(F.col("deg_x")).alias(
            "deg_v"
        ),
    )
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("deg_v").alias("d1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("deg_v").alias("d2"))
    wedges = e1.join(e2, "u").filter(
        F.struct("d1", "v1") < F.struct("d2", "v2")
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    # canonical corner order by id (the orientation order was by
    # degree); array_sort, not sum-minus-extremes — the arithmetic
    # trick overflows bigint under ANSI mode for ids near 2^62
    # (64-bit hashed node ids are the norm on real web graphs)
    corners = F.array_sort(F.array("u", "v1", "v2"))
    return tri.select(
        F.element_at(corners, 1).alias("a"),
        F.element_at(corners, 2).alias("b"),
        F.element_at(corners, 3).alias("c"),
    )
