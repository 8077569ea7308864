"""Similarity search over an embedding column (``array<float>``).

Two tiers (SURVEY.md §2.7 north-star):

- ``brute_force_topk``: exact cosine top-k. The query vector is a
  broadcast single-row DataFrame; scoring is a JVM-side expression over
  every row — a full scan, but embarrassingly parallel and shuffle-free
  until the final top-k (which Spark executes as per-partition heaps +
  driver merge via TakeOrderedAndProject). This is the correctness
  baseline at any scale.
- ``ivf_topk``: IVF-style probe. Vectors are pre-assigned to the nearest
  of K centroids (one broadcast join + argmax, no shuffle of the big
  side); a query scores only its own cluster — at 100 TB with K=4096
  this cuts the scan by ~K×. Here centroids are taken deterministically
  (vec_id < K) so the oracle can reproduce the assignment; in production
  they'd come from k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from flink_template_spark.functions.vector import cosine


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine to the (single-row) query DataFrame."""
    q = query.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = (
        vectors.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (broadcast argmax;
    rounded similarity + centroid id tiebreak for determinism)."""
    c = centroids.select(
        F.col(centroid_id), F.col(vec_col).alias("__cvec")
    )
    scored = vectors.crossJoin(F.broadcast(c)).select(
        id_col,
        vec_col,
        centroid_id,
        F.round(cosine(F.col(vec_col), F.col("__cvec")), 6).alias("c_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("c_sim"), centroid_id)
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, vec_col, F.col(centroid_id).alias("cluster"))
    )


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe only the query's cluster, then exact top-k inside it."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    q = query.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    q_cluster = (
        assigned.join(F.broadcast(q), assigned[id_col] == F.col("__qid"))
        .select(F.col("cluster").alias("__qcluster"), "__qid", "__qvec")
    )
    return (
        assigned.join(F.broadcast(q_cluster), assigned.cluster == F.col("__qcluster"))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            id_col,
            F.col("cluster"),
            F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )
