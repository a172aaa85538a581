"""Reciprocal-rank fusion (RRF) of two retrieval rank lists — the
standard hybrid-search combiner (Cormack, Clarke & Buettcher 2009,
"Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods"; the same formula Elasticsearch/OpenSearch expose as
`rrf`). Fusing a lexical ranking (BM25) with a vector ranking (cosine
ANN) is the default RAG retrieval stack; RRF needs no score calibration
because it consumes RANKS, not scores — which also makes it trivially
engine-exact.

    rrf(d) = Σ_lists 1 / (c + rank_list(d))        (c = 60 canonical)

Fixed-point form: ``rrf_e6 = Σ floor(1e6 / (c + rank))`` — pure integer
division of positive ints, bit-identical everywhere; a document missing
from a list contributes 0 (the standard convention for truncated lists).

Plan shape: both input lists are top-k tables (k rows each — tiny), so
the fusion join, the coalesce arithmetic, and the final top-k are all
driver-trivial; the heavy lifting happened in the upstream rankers. At
100 TB the lists stay k-sized — fusion cost is independent of corpus
size, which is exactly why RRF is the production combiner.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

RRF_C = 60
RRF_E = 1_000_000


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_a: str,
    id_b: str,
    k: int = 50,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse two (id, rank) lists; output top-``k`` of
    (id, rank_a, rank_b, rrf_e6, rank) — null rank_x = absent from that
    list (contributes 0). Ties break on id.

    Inputs need columns (``id_a``|``id_b``, ``rank``); extra columns are
    dropped so callers can pass ranker outputs unprojected."""
    a = ranks_a.select(F.col(id_a).alias("id"), F.col("rank").alias("rank_a"))
    b = ranks_b.select(F.col(id_b).alias("id"), F.col("rank").alias("rank_b"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        "rank_a",
        "rank_b",
        (
            F.coalesce(F.expr(f"{RRF_E} div ({c} + rank_a)"), F.lit(0))
            + F.coalesce(F.expr(f"{RRF_E} div ({c} + rank_b)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_e6"),
    )
    top = fused.orderBy(F.desc("rrf_e6"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("rrf_e6"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w))


def duck_rrf_cte(
    list_a_cte: str,
    list_b_cte: str,
    id_a: str,
    id_b: str,
    k: int = 50,
    c: int = RRF_C,
) -> str:
    """DuckDB mirror of :func:`rrf_fuse` as a CTE body: fuses CTEs named
    ``list_a_cte``/``list_b_cte`` (columns id_x + rank); final CTE
    ``rrfr`` has (id, rank_a, rank_b, rrf_e6, rank)."""
    return f"""
fa AS (SELECT {id_a} AS id, rank AS rank_a FROM {list_a_cte}),
fb AS (SELECT {id_b} AS id, rank AS rank_b FROM {list_b_cte}),
fused AS (
  SELECT coalesce(fa.id, fb.id) AS id, rank_a, rank_b,
         (coalesce({RRF_E} // ({c} + rank_a), 0)
          + coalesce({RRF_E} // ({c} + rank_b), 0))::BIGINT AS rrf_e6
  FROM fa FULL OUTER JOIN fb ON fa.id = fb.id
),
rrfr AS (
  SELECT * FROM (
    SELECT id, rank_a, rank_b, rrf_e6,
           row_number() OVER (ORDER BY rrf_e6 DESC, id) AS rank
    FROM fused)
  WHERE rank <= {k}
)"""
