"""Matryoshka prefix-dimension recall: how much ANN quality survives
truncating embeddings to their first d dimensions? (Kusupati et al.
2022, "Matryoshka Representation Learning" — MRL-trained embeddings
pack coarse semantics into the prefix, so serving systems shrink
vectors 4-16× and need the recall@k cost of that truncation measured
before flipping the switch.)

The measurement is the ts9 recall harness with a different approximate
arm: exact top-k on FULL vectors vs exact top-k on PREFIX-SLICED
vectors (both brute force — the quantity isolated is the truncation
loss, not an index's loss). Slicing is a pure projection
(``F.slice``), so the prefix arm runs the identical broadcast-join plan
on narrower arrays — cheaper, not just comparable.

Exactness: both arms use the engine's floor-e4 cosine surface; recall
is an integer join-count ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.similarity.knn import cosine_topk


def prefix_recall_at_k(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    prefix_dims: int,
    k: int = 5,
) -> DataFrame:
    """(query_id, n_exact, n_hits, recall_e4): per-query overlap between
    full-vector top-k and first-``prefix_dims``-only top-k."""
    exact = cosine_topk(df, queries, vec_col, id_col, k=k).select(
        "query_id", "match_id"
    )
    sliced = df.select(
        F.col(id_col),
        F.slice(F.col(vec_col), 1, prefix_dims).alias(vec_col),
    )
    sliced_q = queries.select(
        F.col(id_col),
        F.slice(F.col(vec_col), 1, prefix_dims).alias(vec_col),
    )
    approx = cosine_topk(sliced, sliced_q, vec_col, id_col, k=k).select(
        "query_id", "match_id", F.lit(1).alias("__hit")
    )
    return (
        exact.join(approx, ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("CAST((10000 * n_hits) div n_exact AS BIGINT)").alias(
                "recall_e4"
            ),
        )
    )
