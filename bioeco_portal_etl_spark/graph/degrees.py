"""Degree-distribution diagnostics over an edge list: the log2-bucketed
degree histogram that sizes every downstream graph plan — it decides
whether triangle orientation is needed (heavy tail), what the PageRank
hub mass looks like, and which vertices need skew salting.

Plan: distinct-neighbor degree is one (src, dst)-distinct + one src
aggregate (both map-side combinable); the histogram is a second,
degree-table-sized aggregate — vertex-scaled, never edge-scaled, past
the first stage. The log2 bucket is ``length(bin(degree)) - 1``:
integer-exact on both engines (no transcendental log2 whose last ulp
could flip a power-of-two boundary).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(bucket, n_nodes, min_degree, max_degree) where bucket =
    floor(log2(out-degree over DISTINCT neighbors)); one row per occupied
    power-of-two band, the standard heavy-tail fingerprint."""
    deg = (
        edges.select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    bucket = (F.length(F.bin(F.col("degree"))) - 1).cast("long")
    return deg.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
    )
