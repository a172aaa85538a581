"""Term burstiness: for each high-frequency term, how concentrated are
its occurrences in the documents that contain it? (Church & Gale 1995,
"Poisson mixtures" — burstiness separates topical content words, which
repeat heavily inside few docs, from function-like words spread thinly
everywhere; corpus curation uses it to pick keyword candidates and to
spot template/boilerplate artifacts whose per-doc rate is anomalous.)

Per term: cf (corpus frequency), df (document frequency), max_tf (the
heaviest single-document count), and rate_e6 = (1e6·cf) div df — the
mean occurrences per CONTAINING document, the simplest burstiness
statistic (1e6 = appears once wherever it appears; ≫1e6 = bursty).

Plan shape: one (doc, term) count agg (partial-combinable), then one
term-level rollup — both shuffles on the term-ish keys, vocabulary
Heaps-bounded — and a top-k head by cf. No windows, no joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.text.doccosine import term_counts


def term_burstiness(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 100,
) -> DataFrame:
    """(term, cf, df, max_tf, rate_e6) for the ``top_k`` terms by corpus
    frequency (ties break on the term) — all tokens qualify
    (min_len=1); df >= 1 always, so rate_e6 needs no zero guard."""
    tc = term_counts(docs, id_col, text_col, min_len=1)
    return (
        tc.groupBy("term")
        .agg(
            F.sum("c").cast("long").alias("cf"),
            F.count(F.lit(1)).cast("long").alias("df"),
            F.max("c").cast("long").alias("max_tf"),
        )
        .select(
            "term",
            "cf",
            "df",
            "max_tf",
            F.expr("CAST((1000000 * cf) div df AS BIGINT)").alias("rate_e6"),
        )
        .orderBy(F.desc("cf"), "term")
        .limit(top_k)
    )


def duck_term_burstiness(docs_select: str, top_k: int = 100) -> str:
    """DuckDB CTE body mirroring :func:`term_burstiness`; exposes
    ``burst(term, cf, df, max_tf, rate_e6)``. ``docs_select`` must
    project (doc_id, text)."""
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""__tb_tc AS (
  SELECT doc_id, term, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest({duck_tokens("text")}) AS term
        FROM ({docs_select}))
  GROUP BY doc_id, term
),
burst AS (
  SELECT term, sum(c)::BIGINT AS cf, count(*)::BIGINT AS df,
         max(c)::BIGINT AS max_tf,
         CAST((1000000 * sum(c)) // count(*) AS BIGINT) AS rate_e6
  FROM __tb_tc GROUP BY term
  ORDER BY cf DESC, term LIMIT {top_k}
)"""
