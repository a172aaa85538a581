"""Deterministic Lloyd's k-means over an embedding column — the iterative
pattern the engine needs for real IVF centroid fitting (ivf.py consumes the
output) and, more generally, for driver-looped convergence algorithms that
SQL cannot express in one statement.

Spark-first shape per iteration: broadcast the K current centroids, assign
each vector to its nearest centroid with a map-side argmin over a literal
centroid array (NO shuffle), then ONE groupBy(cluster) average to produce
new centroids. The loop runs on the driver; K centroid rows collect per
iteration (tiny). Determinism: init = lowest-k ids, squared-L2 distance,
ties break on lower cluster id — rerunning always yields identical
centroids, so the catalog's rows-only check is stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str
) -> DataFrame:
    """(id, cluster, sq_dist) via map-side argmin against literal centroids."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = F.array(*[_sq_dist(v, c) for c in centroids])
    best = F.array_min(dists)
    return df.select(
        F.col(id_col),
        (F.array_position(dists, best) - 1).cast("int").alias("cluster"),
        best.alias("sq_dist"),
    )


def fit_kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    max_iter: int = 5,
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's iterations; returns (centroids, per-iteration mean objective).

    Init: the vectors of the k lowest ids (deterministic; k-means++ would
    need a seeded RNG — swap in when a seed policy exists). Empty clusters
    keep their previous centroid."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        raise ValueError("empty input")
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    centroids = [list(r.v) for r in init]
    objective = []
    for _ in range(max_iter):
        # round-12 (guide §2.4): keep the vector on the assignment row
        # instead of re-attaching it with an id self-join — the argmin is
        # a projection, so the per-iteration plan is scan + one grouped
        # aggregate (the join added two exchanges and a second scan per
        # iteration for a column the scan already had)
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        dists = F.array(*[_sq_dist(v, c) for c in centroids])
        best = F.array_min(dists)
        joined = df.select(
            F.col(vec_col),
            (F.array_position(dists, best) - 1).cast("int").alias("cluster"),
            best.alias("sq_dist"),
        )
        stats = (
            joined.groupBy("cluster")
            .agg(
                F.array(
                    *[
                        F.avg(F.element_at(F.col(vec_col), i + 1).cast("double"))
                        for i in range(len(centroids[0]))
                    ]
                ).alias("centroid"),
                F.avg("sq_dist").alias("mean_sq"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        total_n = sum(r.n for r in stats)
        objective.append(
            sum(r.mean_sq * r.n for r in stats) / total_n if total_n else 0.0
        )
        new_centroids = list(centroids)
        for r in stats:
            new_centroids[r.cluster] = list(r.centroid)
        centroids = new_centroids
    return centroids, objective
