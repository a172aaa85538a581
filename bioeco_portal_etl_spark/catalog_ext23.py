"""Round-6 catalog extensions, third batch — 5 entries:

- tx35_term_burstiness: per-term corpus frequency vs document frequency
  (Church-Gale burstiness) for the top-100 terms (text/burst.py);
- ts20_matryoshka_recall: recall@5 of prefix-16-dim cosine search vs
  full 64-dim exact — the MRL truncation-cost readout
  (similarity/matryoshka.py);
- sk11_minhash_lang_sim: MERGEABLE per-language MinHash signatures
  (group min over the dedupe family's exact permutations) with pairwise
  Jaccard estimates CERTIFIED against the exact set Jaccard
  (sketches/minhash_merge.py);
- mm17_jpeg_blockiness: the no-reference block-artifact statistic
  (8-grid boundary vs interior difference mass) through the REAL
  baseline JPEG decode (multimodal/media.py jpeg_blockiness);
- dq13_duplicate_burden: per-language share of corpus volume that is
  redundant copies under the prefix-fingerprint cluster key
  (operators/quality.py duplicate_burden) — "what dedup would save".

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# tx35 — term burstiness
# ---------------------------------------------------------------------------


def tx35_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Top-100 terms by corpus frequency with df / max_tf / per-doc rate
    (text/burst.py)."""
    from bioeco_portal_etl_spark.text.burst import term_burstiness

    d = T(spark, sf, "documents")
    return term_burstiness(d, "doc_id", "text", top_k=100).orderBy(
        F.desc("cf"), "term"
    )


def _tx35_sql() -> str:
    from bioeco_portal_etl_spark.text.burst import duck_term_burstiness

    body = duck_term_burstiness("SELECT doc_id, text FROM documents", top_k=100)
    return f"""
WITH {body}
SELECT term, cf, df, max_tf, rate_e6 FROM burst ORDER BY cf DESC, term"""


# ---------------------------------------------------------------------------
# ts20 — matryoshka prefix-dimension recall
# ---------------------------------------------------------------------------


def ts20_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Per-query recall@5 of first-16-dims cosine top-k against the full
    64-dim exact ranking (similarity/matryoshka.py)."""
    from bioeco_portal_etl_spark.catalog_ext import _query_vectors
    from bioeco_portal_etl_spark.similarity.matryoshka import (
        prefix_recall_at_k,
    )

    e = T(spark, sf, "embeddings")
    return prefix_recall_at_k(
        e, _query_vectors(spark, sf), "embedding", "vec_id", prefix_dims=16, k=5
    ).orderBy("query_id")


def _ts20_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_COS, _DUCK_VEC

    prefix_cos = (
        "list_reduce(list_transform(range(1, 17), i -> q.e[i] * c.e[i]),"
        " (a, b) -> a + b) / (q.p_nrm * c.p_nrm)"
    )
    return f"""
WITH {_DUCK_VEC},
np AS (
  SELECT vec_id, e, nrm,
         sqrt(list_reduce(list_transform(range(1, 17), i -> e[i] * e[i]),
                          (a, b) -> a + b)) AS p_nrm
  FROM n
),
fullp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({_DUCK_COS}) * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id < 10) q
  JOIN n c ON q.vec_id <> c.vec_id
),
exact AS (
  SELECT query_id, match_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM fullp)
  WHERE rank <= 5
),
prefp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({prefix_cos}) * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM np WHERE vec_id < 10) q
  JOIN np c ON q.vec_id <> c.vec_id
),
approx AS (
  SELECT query_id, match_id, 1 AS hit FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM prefp)
  WHERE rank <= 5
)
SELECT e.query_id, count(*)::BIGINT AS n_exact,
       sum(coalesce(a.hit, 0))::BIGINT AS n_hits,
       CAST((10000 * sum(coalesce(a.hit, 0))) // count(*) AS BIGINT)
         AS recall_e4
FROM exact e LEFT JOIN approx a USING (query_id, match_id)
GROUP BY e.query_id
ORDER BY query_id"""


# ---------------------------------------------------------------------------
# sk11 — mergeable MinHash language similarity, certified
# ---------------------------------------------------------------------------


def sk11_minhash_lang_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise language Jaccard: 8-permutation mergeable MinHash
    estimate next to the exact set Jaccard (sketches/minhash_merge.py)."""
    from bioeco_portal_etl_spark.sketches.minhash_merge import (
        group_minhash_similarity,
    )

    d = T(spark, sf, "documents").select(
        F.coalesce("lang", F.lit("und")).alias("lang"), "doc_id", "text"
    )
    return group_minhash_similarity(
        d, "lang", "doc_id", "text", k=3, num_perm=8
    ).orderBy("grp_a", "grp_b")


def _sk11_sql() -> str:
    from bioeco_portal_etl_spark.sketches.minhash_merge import (
        duck_group_minhash_similarity,
    )

    body = duck_group_minhash_similarity(
        "SELECT coalesce(lang, 'und') AS grp, doc_id, text FROM documents",
        k=3,
        num_perm=8,
    )
    return f"""
WITH {body}
SELECT grp_a, grp_b, est_matches, est_jaccard_e6, inter_size,
       union_size, true_jaccard_e6
FROM gmh ORDER BY grp_a, grp_b"""


# ---------------------------------------------------------------------------
# mm17 — JPEG blockiness
# ---------------------------------------------------------------------------


def mm17_jpeg_blockiness(spark: SparkSession, sf: str) -> DataFrame:
    """Boundary-vs-interior horizontal difference mass for 120 synthetic
    tile-constant JPEGs through the real decode: interior pairs land
    inside constant tiles (sum 0 contribution there), grid-boundary
    pairs carry the tile deltas — the oracle recomputes both from the
    tile formula."""
    from bioeco_portal_etl_spark.multimodal.media import (
        jpeg_blockiness,
        synth_gray_jpeg,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 120)
    )
    return jpeg_blockiness(synth_gray_jpeg(ids, "doc_id")).orderBy("media_id")


def _mm17_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        JPEG_H_BASE,
        JPEG_H_MOD,
        JPEG_W_BASE,
        JPEG_W_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
dims AS (
  SELECT doc_id,
         {JPEG_W_BASE} + doc_id % {JPEG_W_MOD} AS w,
         {JPEG_H_BASE} + doc_id % {JPEG_H_MOD} AS h
  FROM ids
),
xs AS (SELECT doc_id, h, w, unnest(range(0, w - 1)) AS x FROM dims),
ys AS (SELECT doc_id, w, x, unnest(range(0, h)) AS y FROM xs),
pairs AS (
  SELECT doc_id,
         CASE WHEN (x + 1) % 8 = 0 THEN 1 ELSE 0 END AS is_boundary,
         abs(((doc_id * 31 + (x // 8) * 7 + (y // 8) * 11) % 256)
             - ((doc_id * 31 + ((x + 1) // 8) * 7 + (y // 8) * 11) % 256))
           AS d
  FROM ys
)
SELECT doc_id AS media_id,
       sum(is_boundary)::BIGINT AS n_boundary,
       sum(CASE WHEN is_boundary = 1 THEN d ELSE 0 END)::BIGINT
         AS boundary_abs_sum,
       sum(1 - is_boundary)::BIGINT AS n_interior,
       sum(CASE WHEN is_boundary = 0 THEN d ELSE 0 END)::BIGINT
         AS interior_abs_sum
FROM pairs GROUP BY doc_id ORDER BY media_id"""


# ---------------------------------------------------------------------------
# dq13 — duplicate burden
# ---------------------------------------------------------------------------


def dq13_duplicate_burden(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language redundant-volume share under the 100-char
    prefix-fingerprint cluster key (the gr6/dq3 blocking convention;
    the synthetic corpus plants prefix dups, not byte dups) —
    operators/quality.py duplicate_burden weighted by n_chars."""
    from bioeco_portal_etl_spark.operators.quality import duplicate_burden

    d = T(spark, sf, "documents").select(
        F.coalesce("lang", F.lit("und")).alias("lang"),
        "doc_id",
        F.substring(F.coalesce("text", F.lit("")), 1, 100).alias("fp"),
        "n_chars",
    )
    return duplicate_burden(d, "lang", "doc_id", "fp", "n_chars").orderBy(
        "grp"
    )


def _dq13_sql() -> str:
    from bioeco_portal_etl_spark.operators.quality import duck_duplicate_burden

    body = duck_duplicate_burden(
        "SELECT coalesce(lang, 'und') AS grp, doc_id AS id,"
        " substr(coalesce(text, ''), 1, 100) AS text,"
        " n_chars AS sz FROM documents"
    )
    return f"""
WITH {body}
SELECT grp, n_docs, n_dup_excess, size_total, size_excess, burden_e6
FROM dburden ORDER BY grp"""


CATALOG_EXT23 = {
    "tx35_term_burstiness": (tx35_term_burstiness, _tx35_sql()),
    "ts20_matryoshka_recall": (ts20_matryoshka_recall, _ts20_sql()),
    "sk11_minhash_lang_sim": (sk11_minhash_lang_sim, _sk11_sql()),
    "mm17_jpeg_blockiness": (mm17_jpeg_blockiness, _mm17_sql()),
    "dq13_duplicate_burden": (dq13_duplicate_burden, _dq13_sql()),
}
