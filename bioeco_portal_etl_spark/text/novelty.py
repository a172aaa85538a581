"""N-gram novelty curve: what fraction of each document's k-grams has
never appeared in any EARLIER document (by a deterministic corpus
order)? The curation signal behind dedup-aware corpus growth: as a crawl
ingests, per-doc novelty decaying toward zero means new data is mostly
restating the old — the point where more tokens stop buying more
information. (The same first-occurrence statistic drives train-set
memorization analyses.)

Plan shape: shingle-explode (distinct per doc) -> ONE groupBy per gram
computing its first-occurrence doc (min doc id) -> broadcast-join-free
re-aggregation by doc. Two shuffles total, both on the gram key, both
partial-aggregatable; gram cardinality is Heaps-bounded so the
first-occurrence table grows sublinearly in corpus size.

Exactness: counts and min-ids are integers; novelty_e6 is an integer
`div`. A doc shorter than k tokens has zero grams and reports
(0, 0, NULL) — the div-by-zero guard convention (abtest.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.text.tokenize import (
    duck_shingles,
    duck_tokens,
    shingles,
    tokens,
)


def ngram_novelty(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty_e6): distinct k-grams per doc,
    how many first appear in THIS doc (min doc_id over the corpus), and
    the integer-e6 ratio. Docs with no grams report (0, 0, NULL)."""
    # two select layers (the text/dedupe.py CollapseProject rule): the
    # token array materializes as a named column so the size guard and
    # every slice inside shingles() don't each re-split the text —
    # measured 6.3s -> sub-second for the explode stage at sf0.1
    tok = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__tok")
    )
    sh = tok.select(
        "doc_id",
        F.explode(shingles(F.col("__tok"), k, distinct=True)).alias("g"),
    )
    first = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("long")
            ).alias("n_novel"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.expr(
            "CASE WHEN coalesce(n_grams, 0) > 0"
            " THEN CAST((1000000 * n_novel) div n_grams AS BIGINT) END"
        ).alias("novelty_e6"),
    )


def duck_ngram_novelty(docs_select: str, k: int = 3) -> str:
    """DuckDB CTE body mirroring :func:`ngram_novelty`; exposes
    ``nov(doc_id, n_grams, n_novel, novelty_e6)``. ``docs_select`` must
    project (doc_id, text)."""
    arr = duck_shingles(duck_tokens("text"), k, distinct=True)
    return f"""__nv_docs AS ({docs_select}),
__nv_sh AS (
  SELECT doc_id, unnest({arr}) AS g FROM __nv_docs
),
__nv_first AS (
  SELECT g, min(doc_id) AS first_doc FROM __nv_sh GROUP BY g
),
__nv_doc AS (
  SELECT s.doc_id, count(*)::BIGINT AS n_grams,
         sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END)::BIGINT
           AS n_novel
  FROM __nv_sh s JOIN __nv_first f USING (g)
  GROUP BY s.doc_id
),
nov AS (
  SELECT d.doc_id,
         coalesce(p.n_grams, 0)::BIGINT AS n_grams,
         coalesce(p.n_novel, 0)::BIGINT AS n_novel,
         CASE WHEN coalesce(p.n_grams, 0) > 0
              THEN CAST((1000000 * p.n_novel) // p.n_grams AS BIGINT) END
           AS novelty_e6
  FROM __nv_docs d LEFT JOIN __nv_doc p USING (doc_id)
)"""
