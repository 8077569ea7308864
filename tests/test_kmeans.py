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
