"""Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein, SIGIR'98)
— the diversity stage between ANN retrieval and consumption: from a
relevance-ranked shortlist, greedily pick items that are relevant to the
query but dissimilar to what's already picked, so the final k isn't five
near-copies of the best hit.

Tier placement: MMR is inherently sequential (each pick depends on the
set so far), so it runs on the partition-batched grouped-map tier
(operators/grouped_map.py) over the SHORTLIST — k·|queries| rows, never
the corpus. The scan-scale work (scoring every candidate) stays in the
JVM cosine tiers (similarity/knn.py); Python sees only the re-rank
window, the same shape as ts7's PQ-shortlist refine.

Determinism: relevance comes in as the JVM-computed floor-e4 cosine;
pairwise sims are Python left-folds over float64 (identical to the
engines' fold — PORTABILITY) floored e4; the greedy objective
``lam·rel_e4 − (10000−lam)·maxsim_e4`` is pure int arithmetic with
(score desc, id asc) tie-breaks, so the DuckDB unrolled-step oracle
replays the exact selection sequence.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MMR_SCHEMA = (
    "query_id long, sel_rank long, match_id long, rel_e4 long, mmr_e8 long"
)


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _mmr_batch(pdf, k_select: int, lam_e4: int):
    import pandas as pd

    from bioeco_portal_etl_spark.operators.grouped_map import group_bounds

    keys = pdf["query_id"].to_numpy()
    starts, ends = group_bounds(keys)
    out = {c: [] for c in ("query_id", "sel_rank", "match_id", "rel_e4", "mmr_e8")}
    for s, e in zip(starts, ends):
        g = pdf.iloc[s:e]
        ids = list(g["match_id"])
        rels = list(g["rel_e4"])
        vecs = [list(v) for v in g["v"]]
        norms = [math.sqrt(_fold_dot(v, v)) for v in vecs]
        remaining = list(range(len(ids)))
        picked: list[int] = []
        sim_cache: dict[tuple[int, int], int] = {}

        def sim_e4(i: int, j: int) -> int:
            key = (min(i, j), max(i, j))
            if key not in sim_cache:
                cos = _fold_dot(vecs[i], vecs[j]) / (norms[i] * norms[j])
                sim_cache[key] = math.floor(cos * 10000)
            return sim_cache[key]

        for rank in range(1, min(k_select, len(ids)) + 1):
            best = None
            for i in remaining:
                maxsim = max((sim_e4(i, j) for j in picked), default=0)
                score = lam_e4 * rels[i] - (10000 - lam_e4) * maxsim
                cand = (-score, ids[i], i)
                if best is None or cand < best:
                    best = cand
            _, _, bi = best
            picked.append(bi)
            remaining.remove(bi)
            out["query_id"].append(keys[s])
            out["sel_rank"].append(rank)
            out["match_id"].append(ids[bi])
            out["rel_e4"].append(rels[bi])
            out["mmr_e8"].append(-best[0])
    return pd.DataFrame(out)


def mmr_rerank(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k_shortlist: int = 20,
    k_select: int = 5,
    lam_e4: int = 5000,
) -> DataFrame:
    """Diversified top-``k_select`` per query: JVM brute-cosine shortlist
    of ``k_shortlist``, then greedy MMR inside the grouped-map tier.
    Output: (query_id, sel_rank, match_id, rel_e4, mmr_e8)."""
    from bioeco_portal_etl_spark.operators.grouped_map import (
        map_complete_groups,
    )
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk

    shortlist = cosine_topk(df, queries, vec_col, id_col, k=k_shortlist)
    with_vec = shortlist.join(
        df.select(
            F.col(id_col).alias("match_id"), F.col(vec_col).alias("v")
        ),
        "match_id",
    ).select(
        "query_id", "match_id", F.col("score_e4").alias("rel_e4"), "v"
    )
    return map_complete_groups(
        with_vec,
        "query_id",
        ["match_id"],
        lambda pdf: _mmr_batch(pdf, k_select, lam_e4),
        MMR_SCHEMA,
    )
