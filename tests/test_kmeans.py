"""Deterministic k-means: convergence, determinism, no data collection."""

from __future__ import annotations

from flink_template_spark.operators.kmeans import (
    kmeans_fit,
    kmeans_inertia,
)
from flink_template_spark.tables import load_table


def test_kmeans_converges_and_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")

    a1, c1 = kmeans_fit(emb, k=4, n_iter=0)
    s0 = kmeans_inertia(a1, c1)
    a2, c2 = kmeans_fit(emb, k=4, n_iter=3)
    s3 = kmeans_inertia(a2, c2)
    # Lloyd iterations must not make mean similarity worse
    assert s3 >= s0 - 1e-9

    # all vectors assigned, clusters from the expected id range
    n = emb.count()
    assert a2.count() == n
    clusters = {r.cluster for r in a2.select("cluster").distinct().collect()}
    assert clusters.issubset(set(range(4)))

    # rerun → identical assignments (exact-integer means, fixed init)
    a3, c3 = kmeans_fit(emb, k=4, n_iter=3)
    assert c2 == c3
    assert a2.exceptAll(a3).count() == 0


def test_knn_join_ivf_recall_vs_exact(spark, sf_dir):
    """The per-cell approximate k-NN join finds most of the exact
    neighbors (recall floor), returns only valid ranks, and never pairs
    a query with itself."""
    from pyspark.sql import functions as F

    from flink_template_spark.operators.kmeans import kmeans_fit
    from flink_template_spark.operators.similarity import (
        knn_join_exact,
        knn_join_ivf,
    )
    from flink_template_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 30)
    _, cents = kmeans_fit(emb, k=4, n_iter=5)
    centroids = spark.createDataFrame(
        [(cid, vec) for cid, vec in cents],
        "centroid_id INT, embedding ARRAY<DOUBLE>",
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_join_exact(queries, emb, k=3).collect()
    }
    approx_rows = knn_join_ivf(queries, emb, centroids, k=3).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}

    assert all(r.query_id != r.neighbor_id for r in approx_rows)
    assert all(1 <= r.rank <= 3 for r in approx_rows)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF knn-join recall {recall:.2f} below floor"
