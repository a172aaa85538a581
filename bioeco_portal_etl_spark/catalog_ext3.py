"""Round-4 (continued) catalog extensions: event-stream product analytics
(attribution, cohort retention, Markov transitions), distribution /
data-quality operators, corpus statistics, and containment dedupe.

Same contract as catalog.py: every entry is a (spark_fn, oracle_sql)
pair over the driver's synthetic tables, aliased identically on both
sides, ending in a deterministic ORDER BY; all scores follow the
PORTABILITY.md fixed-point / decimal / floor-division conventions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# rel21 — first/last-touch attribution
# ---------------------------------------------------------------------------


def rel21_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Channel attribution for purchase conversions (operators/attribution.py):
    both touch models resolved in ONE user-hash window pass, revenue as
    DECIMAL-exact sums surfaced DOUBLE."""
    from bioeco_portal_etl_spark.operators.attribution import (
        attribute_conversions,
    )

    e = T(spark, sf, "events")
    return attribute_conversions(
        e, "user_id", "ts", "event_type", "value", "purchase"
    ).orderBy("channel")


REL21_SQL = """
WITH conv AS (
  SELECT event_type,
         CAST(value AS DECIMAL(18,6)) AS v,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS) OVER w AS ft,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS lt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
c AS (SELECT * FROM conv WHERE event_type = 'purchase' AND ft IS NOT NULL),
f AS (
  SELECT ft AS channel, count(*)::BIGINT AS ft_conversions,
         sum(v)::DOUBLE AS ft_revenue
  FROM c GROUP BY ft
),
l AS (
  SELECT lt AS channel, count(*)::BIGINT AS lt_conversions,
         sum(v)::DOUBLE AS lt_revenue
  FROM c GROUP BY lt
)
SELECT coalesce(f.channel, l.channel) AS channel,
       coalesce(ft_conversions, 0) AS ft_conversions,
       coalesce(ft_revenue, 0.0) AS ft_revenue,
       coalesce(lt_conversions, 0) AS lt_conversions,
       coalesce(lt_revenue, 0.0) AS lt_revenue
FROM f FULL OUTER JOIN l ON f.channel = l.channel
ORDER BY channel
"""


# ---------------------------------------------------------------------------
# rel22 — cohort retention triangle
# ---------------------------------------------------------------------------

_COHORT_ORIGIN = "2024-01-01"


def rel22_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention triangle (operators/cohorts.py): event stream
    reduced to per-user (first week, week set) in one groupBy, triangle
    aggregated from the bounded per-user week sets."""
    from bioeco_portal_etl_spark.operators.cohorts import cohort_retention

    e = T(spark, sf, "events")
    return cohort_retention(e, "user_id", "ts", _COHORT_ORIGIN).orderBy(
        "cohort_week", "week_offset"
    )


REL22_SQL = f"""
WITH wk AS (
  SELECT user_id AS u,
         (date_diff('day', DATE '{_COHORT_ORIGIN}', CAST(ts AS DATE)) // 7)
           ::BIGINT AS w
  FROM events
),
per_user AS (
  SELECT u, min(w) AS cohort_week, list(DISTINCT w) AS weeks FROM wk GROUP BY u
),
cells AS (
  SELECT cohort_week, unnest(weeks) - cohort_week AS week_offset, u
  FROM per_user
),
tri AS (
  SELECT cohort_week, week_offset, count(DISTINCT u)::BIGINT AS n_active
  FROM cells GROUP BY cohort_week, week_offset
),
sizes AS (
  SELECT cohort_week, count(*)::BIGINT AS cohort_size
  FROM per_user GROUP BY cohort_week
)
SELECT t.cohort_week, t.week_offset, t.n_active, s.cohort_size,
       CAST(floor(t.n_active::DOUBLE * 10000.0 / s.cohort_size::DOUBLE)
            AS BIGINT) AS retention_e4
FROM tri t JOIN sizes s ON s.cohort_week = t.cohort_week
ORDER BY t.cohort_week, t.week_offset
"""


# ---------------------------------------------------------------------------
# rel23 — Markov transition matrix
# ---------------------------------------------------------------------------


def rel23_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order event transition matrix (operators/transitions.py):
    lead() in the shared user-hash sort, state-space-sized output."""
    from bioeco_portal_etl_spark.operators.transitions import (
        markov_transitions,
    )

    e = T(spark, sf, "events")
    return markov_transitions(e, "user_id", "ts", "event_type", "event_id").orderBy(
        "src", "dst"
    )


REL23_SQL = """
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
),
counts AS (
  SELECT src, dst, count(*)::BIGINT AS cnt
  FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
),
totals AS (SELECT src, sum(cnt)::BIGINT AS row_total FROM counts GROUP BY src)
SELECT c.src, c.dst, c.cnt,
       CAST(floor(c.cnt::DOUBLE * 10000.0 / t.row_total::DOUBLE) AS BIGINT)
         AS p_e4
FROM counts c JOIN totals t ON t.src = c.src
ORDER BY c.src, c.dst
"""


# ---------------------------------------------------------------------------
# tx15 — token-distribution entropy
# ---------------------------------------------------------------------------


def tx15_token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc Shannon entropy quality axis (text/analysis.py
    token_entropy_table): per-term e4 quantization BEFORE the sum, one
    data-sized shuffle then Heaps-bounded stages."""
    from bioeco_portal_etl_spark.text.analysis import token_entropy_table

    d = T(spark, sf, "documents")
    return token_entropy_table(d, "doc_id", "text").orderBy("doc_id")


def _tx15_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH tok AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS t FROM documents
),
tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, t),
wn AS (
  SELECT doc_id, tf,
         (sum(tf) OVER (PARTITION BY doc_id))::BIGINT AS n
  FROM tf
),
term AS (
  SELECT doc_id, n,
         floor((tf::DOUBLE / n::DOUBLE) * ln(n::DOUBLE / tf::DOUBLE)
               * 10000)::BIGINT AS term_e4
  FROM wn
)
SELECT doc_id, max(n) AS n_tokens, count(*)::BIGINT AS n_types,
       sum(term_e4)::BIGINT AS entropy_e4
FROM term GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tx16 — PMI collocations
# ---------------------------------------------------------------------------


def tx16_pmi_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Top-100 PMI collocations (text/analysis.py pmi_bigrams): bigram
    count table + broadcast marginals, TakeOrdered ranking."""
    from bioeco_portal_etl_spark.text.analysis import pmi_bigrams

    d = T(spark, sf, "documents")
    return pmi_bigrams(d, "text", min_count=5, top_k=100)


def _tx16_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH tk AS (
  SELECT {duck_tokens("text")} AS t FROM documents
),
big AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM tk WHERE len(t) >= 2
),
c12 AS (SELECT w1, w2, count(*)::BIGINT AS cnt FROM big GROUP BY w1, w2),
lmarg AS (SELECT w1, sum(cnt)::BIGINT AS c1 FROM c12 GROUP BY w1),
rmarg AS (SELECT w2, sum(cnt)::BIGINT AS c2 FROM c12 GROUP BY w2),
tot AS (SELECT sum(cnt)::BIGINT AS n FROM c12)
SELECT c.w1, c.w2, c.cnt,
       floor(ln((c.cnt::DOUBLE / l.c1::DOUBLE) * (t.n::DOUBLE / r.c2::DOUBLE))
             * 10000)::BIGINT AS pmi_e4
FROM c12 c
JOIN lmarg l ON l.w1 = c.w1
JOIN rmarg r ON r.w2 = c.w2
CROSS JOIN tot t
WHERE c.cnt >= 5
ORDER BY pmi_e4 DESC, c.w1, c.w2
LIMIT 100
"""


# ---------------------------------------------------------------------------
# tx17 — inverted-index postings summary
# ---------------------------------------------------------------------------


def tx17_postings(spark: SparkSession, sf: str) -> DataFrame:
    """Posting-list summary (text/analysis.py postings_table): one token-hash
    window resolves df / total-tf / best posting together."""
    from bioeco_portal_etl_spark.text.analysis import postings_table

    d = T(spark, sf, "documents")
    return postings_table(d, "doc_id", "text", min_df=5).orderBy("token")


def _tx17_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH tok AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS token FROM documents
),
tf AS (
  SELECT token, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY token, doc_id
),
wn AS (
  SELECT token, doc_id, tf,
         count(*) OVER (PARTITION BY token)::BIGINT AS df_docs,
         (sum(tf) OVER (PARTITION BY token))::BIGINT AS tf_total,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id)
           AS rk
  FROM tf
)
SELECT token, df_docs, tf_total, doc_id AS top_doc
FROM wn WHERE rk = 1 AND df_docs >= 5
ORDER BY token
"""


CATALOG_EXT3: dict = {
    "rel21_attribution": (rel21_attribution, REL21_SQL),
    "rel22_cohort_retention": (rel22_cohort_retention, REL22_SQL),
    "rel23_transitions": (rel23_transitions, REL23_SQL),
    "tx15_token_entropy": (tx15_token_entropy, _tx15_sql()),
    "tx16_pmi_bigrams": (tx16_pmi_bigrams, _tx16_sql()),
    "tx17_postings": (tx17_postings, _tx17_sql()),
}
