"""Deterministic k-means: monotone objective, stable reruns, sane clusters."""

from __future__ import annotations

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.similarity.kmeans import assign_clusters, fit_kmeans
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE


def test_kmeans_objective_decreases_and_is_deterministic(spark):
    emb = read_parquet_table(spark, SF_SMOKE, "embeddings")
    c1, obj1 = fit_kmeans(emb, "embedding", "vec_id", k=4, max_iter=4)
    # Lloyd's objective is non-increasing (tolerance for float noise)
    assert all(b <= a + 1e-9 for a, b in zip(obj1, obj1[1:])), obj1
    c2, obj2 = fit_kmeans(emb, "embedding", "vec_id", k=4, max_iter=4)
    assert c1 == c2 and obj1 == obj2  # bit-identical reruns


def test_kmeans_assignments_cover_all_rows(spark):
    emb = read_parquet_table(spark, SF_SMOKE, "embeddings")
    centroids, _ = fit_kmeans(emb, "embedding", "vec_id", k=4, max_iter=2)
    assigned = assign_clusters(emb, centroids, "embedding", "vec_id")
    assert assigned.count() == emb.count()
    clusters = {r.cluster for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(4)) and len(clusters) >= 2
    assert assigned.filter(F.col("sq_dist") < 0).count() == 0
