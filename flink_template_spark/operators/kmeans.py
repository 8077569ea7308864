"""Deterministic distributed k-means over an embedding column — the
iterative-algorithm member of the engine surface, and the producer of
real IVF centroids for operators.similarity (which otherwise takes
centroids on faith).

Design for scale:
- each iteration is ONE distributed job: broadcast the K centroids
  (tiny), assign every vector to its nearest centroid (codegen cosine),
  re-aggregate means — a single shuffle of K×dim partial sums;
- only the centroids (K × dim doubles) ever reach the driver, never the
  data;
- determinism: init = lowest-K vec_ids; means via fixed-point
  quantization (×1e7 → bigint sums, exact in any partition order), ties
  broken by centroid id — the same discipline as q_centroids_by_label.

Not SQL-expressible as one query (driver-side iteration), so its driver
entry is rows-only; convergence and determinism are pytest-asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_template_spark.functions.vector import cosine, cosine_lit_spark, lit_doubles

QUANT = 10_000_000.0


def _assign(vectors: DataFrame, centroids: list[tuple[int, list[float]]],
            id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment against broadcast literal centroids.

    Each similarity column is ONE parsed SQL string (cosine_lit_spark):
    the earlier per-element lit + lambda builders cost ~0.45 s of py4j
    chatter per K=4 centroid set, re-paid every Lloyd iteration.
    (Optimization r12 measured the Arrow-kernel dual of this assign —
    one pandas_udf emitting all K cosines — at +6% WALL for k=4: the
    Arrow conversion of the vector column exceeds the ~2 folds/centroid
    it saves. Negative result recorded in OPTIMIZATION_r12.md; the
    JVM-side literal folds stay.)"""
    sims = [
        F.expr(f"ROUND({cosine_lit_spark(vec_col, cvec)}, 6)").alias(
            f"__s_{cid}"
        )
        for cid, cvec in centroids
    ]
    scored = vectors.select(id_col, vec_col, *sims)
    # argmax over the K similarity columns, centroid-id tiebreak
    best = F.greatest(*[F.col(f"__s_{cid}") for cid, _ in centroids])
    cluster = F.coalesce(
        *[
            F.when(F.col(f"__s_{cid}") == best, F.lit(cid))
            for cid, _ in centroids
        ]
    )
    return scored.select(id_col, vec_col, cluster.alias("cluster"))


def _recompute(assigned: DataFrame, dim: int, vec_col: str) -> list[tuple[int, list[float]]]:
    """Exact-integer mean per cluster; only K×dim numbers hit the driver."""
    exploded = assigned.select(
        "cluster", F.posexplode(vec_col).alias("pos", "el")
    ).withColumn(
        "q", F.round(F.col("el").cast("double") * QUANT, 0).cast("bigint")
    )
    means = (
        exploded.groupBy("cluster", "pos")
        .agg((F.sum("q").cast("double") / (F.lit(QUANT) * F.count(F.lit(1)))).alias("m"))
        .collect()
    )
    by_cluster: dict[int, list[float]] = {}
    for r in means:
        by_cluster.setdefault(r.cluster, [0.0] * dim)[r.pos] = r.m
    return sorted(by_cluster.items())


def kmeans_fit(
    vectors: DataFrame,
    k: int = 4,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd iterations with cosine assignment; returns (assignments,
    centroids). Deterministic for fixed inputs."""
    first = vectors.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    dim = len(first[0][vec_col])
    centroids = [(i, [float(x) for x in row[vec_col]]) for i, row in enumerate(first)]
    assigned = _assign(vectors, centroids, id_col, vec_col)
    for _ in range(n_iter):
        centroids = _recompute(assigned, dim, vec_col)
        assigned = _assign(vectors, centroids, id_col, vec_col)
    return assigned, centroids


def kmeans_inertia(assigned: DataFrame,
                   centroids: list[tuple[int, list[float]]],
                   vec_col: str = "embedding") -> float:
    """Mean assignment similarity (higher = tighter clusters)."""
    sims = F.coalesce(
        *[
            F.when(
                F.col("cluster") == cid,
                cosine(F.col(vec_col), lit_doubles(cvec)),
            )
            for cid, cvec in centroids
        ]
    )
    return assigned.agg(F.avg(sims).alias("s")).first().s
