"""Round-4 (continued) catalog extensions — 26 entries:

- event-stream analytics: attribution (rel21), cohort retention (rel22),
  Markov transitions (rel23), CUSUM drift (x18), calendar gaps (rel25);
- corpus statistics: token entropy (tx15), PMI collocations (tx16),
  postings (tx17), script detection (tx18), boilerplate coverage (tx19);
- distribution / DQ: histogram (x16), winsorize (x17), equi-depth bins
  (x20), sampled quantiles (sk6), constraint suite (dq1), referential
  integrity (dq2), group z-score (x19);
- dedupe / similarity / graph: containment pairs (td10), dup-source
  matrix (x21), degree histogram (gr4), node similarity (gr5), MMR
  re-rank (ts8);
- CDC apply (rel24), video scene cuts (mm5), and the streaming
  append/update aggregate faces (w9, w10).

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



# ---------------------------------------------------------------------------
# x16 — equi-width histogram
# ---------------------------------------------------------------------------


def x16_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """20-bin equi-width histogram of order totals (operators/stats.py):
    one scan + broadcast 1-row bounds, integer bin arithmetic."""
    from bioeco_portal_etl_spark.operators.stats import equi_width_histogram

    o = T(spark, sf, "orders")
    return equi_width_histogram(o, "o_totalprice", nbins=20).orderBy("bin")


X16_SQL = """
WITH vals AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
binned AS (
  SELECT least(floor(((v - lo) * 20)::DOUBLE / (hi - lo + 1)), 19)::BIGINT
           AS bin,
         lo, hi
  FROM vals CROSS JOIN bounds
),
edged AS (
  SELECT bin,
         lo + floor((bin * (hi - lo + 1))::DOUBLE / 20)::BIGINT AS lo_e,
         lo + floor(((bin + 1) * (hi - lo + 1))::DOUBLE / 20)::BIGINT - 1
           AS hi_e
  FROM binned
)
SELECT bin, lo_e, hi_e, count(*)::BIGINT AS n_rows
FROM edged GROUP BY bin, lo_e, hi_e ORDER BY bin
"""


# ---------------------------------------------------------------------------
# x17 — percentile winsorization
# ---------------------------------------------------------------------------


def x17_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """p5/p95 nearest-rank winsorized price summary per return flag
    (operators/stats.py): rank selection, not percentile interpolation."""
    from bioeco_portal_etl_spark.operators.stats import winsorize_stats

    li = T(spark, sf, "lineitem")
    return winsorize_stats(li, "l_returnflag", "l_extendedprice").orderBy("g")


X17_SQL = """
WITH vals AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
),
ranked AS (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM vals
),
thresholds AS (
  SELECT g,
         max(CASE WHEN rn = floor((5 * n + 99)::DOUBLE / 100)::BIGINT
                  THEN v END) AS lo_e,
         max(CASE WHEN rn = floor((95 * n + 99)::DOUBLE / 100)::BIGINT
                  THEN v END) AS hi_e
  FROM ranked GROUP BY g
),
clamped AS (
  SELECT vals.g, lo_e, hi_e, greatest(least(v, hi_e), lo_e) AS c
  FROM vals JOIN thresholds ON thresholds.g = vals.g
)
SELECT g, count(*)::BIGINT AS n_rows, any_value(lo_e) AS lo_e,
       any_value(hi_e) AS hi_e, sum(c)::BIGINT AS win_sum_e,
       floor(sum(c)::DOUBLE / count(*)::DOUBLE)::BIGINT AS win_mean_e
FROM clamped GROUP BY g ORDER BY g
"""


# ---------------------------------------------------------------------------
# x18 — CUSUM drift detection
# ---------------------------------------------------------------------------

_CUSUM_THRESHOLD_E2 = 20000  # 200.00 value-units of accumulated deviation


def x18_cusum_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user CUSUM drift vs the global value mean (operators/drift.py):
    broadcast scalar mean + one key-hash cumulative window, all integer."""
    from bioeco_portal_etl_spark.operators.drift import cusum_drift

    e = T(spark, sf, "events")
    return cusum_drift(
        e, "user_id", "ts", "event_id", "value", _CUSUM_THRESHOLD_E2
    ).orderBy("key")


X18_SQL = f"""
WITH vals AS (
  SELECT user_id AS key, ts, event_id,
         CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
m AS (SELECT (sum(v) // count(*))::BIGINT AS mean_e FROM vals),
walked AS (
  SELECT key, event_id,
         (sum(v - mean_e) OVER (PARTITION BY key ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS s
  FROM vals CROSS JOIN m
)
SELECT key, count(*)::BIGINT AS n_events,
       max(abs(s))::BIGINT AS max_abs_cusum_e,
       min(CASE WHEN abs(s) > {_CUSUM_THRESHOLD_E2} THEN event_id END)
         AS first_cross_id
FROM walked GROUP BY key ORDER BY key
"""


# ---------------------------------------------------------------------------
# sk6 — hash-sampled quantiles
# ---------------------------------------------------------------------------


def sk6_sampled_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """p50/p90/p99 order totals per priority from a deterministic 1/8
    md5 sample (sketches/sampleq.py): scan-stage predicate, rank-exact
    quantiles on the sampled fraction only."""
    from bioeco_portal_etl_spark.sketches.sampleq import sampled_quantiles

    o = T(spark, sf, "orders")
    return sampled_quantiles(
        o, "o_orderpriority", "o_orderkey", "o_totalprice"
    ).orderBy("g")


def _sk6_sql() -> str:
    from bioeco_portal_etl_spark.sketches import duck_h60

    h = duck_h60("CAST(o_orderkey AS VARCHAR)")
    return f"""
WITH sample AS (
  SELECT o_orderpriority AS g,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE ({h}) % 8 = 0
),
ranked AS (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM sample
)
SELECT g, max(n)::BIGINT AS n_sample,
       max(CASE WHEN rn = floor((50 * n + 99)::DOUBLE / 100)::BIGINT
                THEN v END) AS p50_e,
       max(CASE WHEN rn = floor((90 * n + 99)::DOUBLE / 100)::BIGINT
                THEN v END) AS p90_e,
       max(CASE WHEN rn = floor((99 * n + 99)::DOUBLE / 100)::BIGINT
                THEN v END) AS p99_e
FROM ranked GROUP BY g ORDER BY g
"""


# ---------------------------------------------------------------------------
# dq1 — data-quality constraint suite
# ---------------------------------------------------------------------------


def dq1_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Deequ-style constraint report over orders (operators/quality.py):
    seven checks, ONE aggregate pass, long-format (check, value)."""
    from bioeco_portal_etl_spark.operators.quality import (
        completeness,
        profile_checks,
        uniqueness_gap,
        violations,
    )

    o = T(spark, sf, "orders")
    checks = {
        "n_rows": F.count(F.lit(1)),
        "null_custkey": completeness("o_custkey"),
        "dup_orderkey": uniqueness_gap("o_orderkey"),
        "bad_status": violations(F.col("o_orderstatus").isin("O", "F", "P")),
        "nonpositive_total": violations(F.col("o_totalprice") > 0),
        "bad_priority": violations(F.col("o_orderpriority").rlike(r"^[1-5]-")),
        "max_date_epochday": F.max(
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01")))
        ),
    }
    return profile_checks(o, checks)


DQ1_SQL = """
WITH agg AS (
  SELECT count(*)::BIGINT AS n_rows,
         sum((o_custkey IS NULL)::INT)::BIGINT AS null_custkey,
         (count(o_orderkey) - count(DISTINCT o_orderkey))::BIGINT
           AS dup_orderkey,
         sum((NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE))::INT)
           ::BIGINT AS bad_status,
         sum((NOT coalesce(o_totalprice > 0, FALSE))::INT)::BIGINT
           AS nonpositive_total,
         sum((NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'),
                           FALSE))::INT)::BIGINT AS bad_priority,
         max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           ::BIGINT AS max_date_epochday
  FROM orders
)
SELECT * FROM (
  SELECT 'n_rows' AS "check", n_rows AS value FROM agg
  UNION ALL SELECT 'null_custkey', null_custkey FROM agg
  UNION ALL SELECT 'dup_orderkey', dup_orderkey FROM agg
  UNION ALL SELECT 'bad_status', bad_status FROM agg
  UNION ALL SELECT 'nonpositive_total', nonpositive_total FROM agg
  UNION ALL SELECT 'bad_priority', bad_priority FROM agg
  UNION ALL SELECT 'max_date_epochday', max_date_epochday FROM agg
) ORDER BY "check"
"""


# ---------------------------------------------------------------------------
# td10 — containment (near-superset) dedupe
# ---------------------------------------------------------------------------


def td10_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment pairs via rare-shingle blocking
    (text/dedupe.py containment_pairs): catches quote-inclusion pairs
    whose low Jaccard hides them from td2's minhash bands."""
    from bioeco_portal_etl_spark.text.dedupe import containment_pairs

    d = T(spark, sf, "documents")
    return containment_pairs(d, "doc_id", "text", threshold=0.8).orderBy(
        "id_a", "id_b"
    )


def _td10_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_shingles, duck_tokens

    return f"""
WITH sh AS (
  SELECT doc_id, {duck_shingles(duck_tokens("text"), 3)} AS sg
  FROM (SELECT doc_id, text FROM documents)
),
ex AS (SELECT doc_id, unnest(sg) AS s FROM sh),
dfreq AS (SELECT s, count(*)::BIGINT AS df FROM ex GROUP BY s),
ranked AS (
  SELECT e.doc_id, e.s, d.df,
         row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.s) AS rk,
         count(*) OVER (PARTITION BY e.doc_id) AS n
  FROM ex e JOIN dfreq d ON d.s = e.s
),
prefix AS (
  SELECT doc_id, s FROM ranked
  -- exact integer miss budget (n * 2000) // 10000 = floor(0.2 n): the
  -- float 0.19999...996 * n form lost a whole miss at exact boundaries
  -- (round-6 hypothesis-completeness fix, mirrored from dedupe.py)
  WHERE rk <= (n * 2000) // 10000 + 1
    AND df BETWEEN 2 AND 1000
),
probe AS (
  SELECT e.doc_id, e.s FROM ex e JOIN dfreq d ON d.s = e.s
  WHERE d.df <= 1000
),
cand AS (
  SELECT DISTINCT least(p.doc_id, q.doc_id) AS id_a,
                  greatest(p.doc_id, q.doc_id) AS id_b
  FROM prefix p JOIN probe q ON q.s = p.s AND q.doc_id <> p.doc_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(x.sg, y.sg))::BIGINT AS n_common,
         len(x.sg)::BIGINT AS n_a, len(y.sg)::BIGINT AS n_b
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b
)
SELECT id_a, id_b, n_common, n_a, n_b,
       ((n_common * 10000) // n_a)::BIGINT AS cont_a_e4,
       ((n_common * 10000) // n_b)::BIGINT AS cont_b_e4
FROM scored
WHERE ((n_common * 10000) // n_a) >= 8000
   OR ((n_common * 10000) // n_b) >= 8000
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# w9 — LIVE streaming tumbling aggregate (append mode)
# ---------------------------------------------------------------------------


def w9_streaming_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked streaming face of w1: a REAL readStream tumbling
    count/sum drained with availableNow into a memory sink in APPEND mode
    — only windows finalized by the watermark emit, so the result is the
    batch aggregate minus the trailing watermark horizon (exactly what
    the oracle computes). The no-data microbatch at drain end advances
    the watermark to max(ts) - delay, finalizing everything before it;
    state is one (window, type) row bounded by the horizon, behind the
    same (window, type) exchange the batch face pays."""
    import os

    from bioeco_portal_etl_spark.streaming.windows import tumbling_counts

    T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(
            F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
        )
        .withWatermark("ts", "2 hours")
    )
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    # state-store instance count = shuffle partitions; size to the
    # drain, scoped + restored (see scoped_shuffle_partitions)
    with scoped_shuffle_partitions(spark, 8):
        q = (
            tumbling_counts(stream)
            .withColumn("sum_value", F.col("sum_value").cast("double"))
            .writeStream.format("memory")
            .queryName("w9_tumbling_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w9 stream did not drain")
    return spark.table("w9_tumbling_mem").orderBy("window_start", "event_type")


W9_SQL = """
WITH mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events)
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events, sum(value::DECIMAL(18,6))::DOUBLE AS sum_value
FROM events CROSS JOIN mx
WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' <= (SELECT wm FROM mx)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# gr4 — degree distribution
# ---------------------------------------------------------------------------

def gr4_degree_hist(spark: SparkSession, sf: str) -> DataFrame:
    """log2-bucketed degree histogram of the customer→order bipartite
    graph (graph/degrees.py) — the heavy-tail fingerprint that decides
    skew strategy; integer-exact buckets via binary-string length,
    vertex-scaled after the first distinct. (The co-order supplier graph
    is degree-uniform in this corpus — one bucket — so the bipartite
    graph is the demo with an actual tail.)"""
    from bioeco_portal_etl_spark.graph.degrees import degree_histogram

    o = T(spark, sf, "orders")
    edges = o.select(
        F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst")
    )
    return degree_histogram(edges).orderBy("bucket")


GR4_SQL = """
WITH deg AS (
  SELECT src, count(*)::BIGINT AS degree
  FROM (SELECT DISTINCT o_custkey AS src, o_orderkey AS dst FROM orders)
  GROUP BY src
)
SELECT (length(bin(degree)) - 1)::BIGINT AS bucket,
       count(*)::BIGINT AS n_nodes,
       min(degree) AS min_degree, max(degree) AS max_degree
FROM deg GROUP BY 1 ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# x19 — per-group z-score normalization
# ---------------------------------------------------------------------------


def x19_group_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event z-score vs the event-type's global moments
    (operators/stats.py group_zscore): broadcast moments, div/sqrt/div
    IEEE chain, output bounded to the first users for the gate."""
    from bioeco_portal_etl_spark.operators.stats import group_zscore

    full = T(spark, sf, "events")
    # moments come from the FULL stream; normalize the bounded slice
    z = group_zscore(full, "event_type", "value")
    return (
        z.filter(F.col("user_id") < 10)
        .select("event_id", "event_type", "v_e", "z_e4")
        .orderBy("event_id")
    )


X19_SQL = """
WITH data AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS v_e
  FROM events
),
m AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(v_e)::BIGINT AS s1,
         sum(v_e * v_e)::BIGINT AS s2
  FROM data GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.v_e,
       CASE WHEN m.n * m.s2 - m.s1 * m.s1 > 0 THEN
         floor((d.v_e::DOUBLE - m.s1::DOUBLE / m.n::DOUBLE)
               / sqrt((m.n * m.s2 - m.s1 * m.s1)::DOUBLE
                      / (m.n * m.n)::DOUBLE) * 10000)::BIGINT
       END AS z_e4
FROM data d JOIN m ON m.event_type = d.event_type
WHERE d.user_id < 10
ORDER BY d.event_id
"""


# ---------------------------------------------------------------------------
# rel24 — CDC apply (MERGE INTO, pure-parquet tier)
# ---------------------------------------------------------------------------


def rel24_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Round-trips x9's changeset through operators/cdc.apply_changeset:
    the Spark side genuinely computes diff(old, new) and applies it back
    to old; the oracle constructs new directly — the entry is the
    apply(old, diff(old, new)) ≡ new law as a hash gate."""
    from bioeco_portal_etl_spark.operators.cdc import (
        apply_changeset,
        snapshot_diff,
    )

    c = T(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    k = F.col("c_custkey")
    changed = c.filter(k % 97 != 0).select(
        k.alias("c_custkey"),
        F.col("c_name"),
        F.when(k % 13 == 0, F.col("c_acctbal") + 100)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(k % 29 == 0, F.lit("CHURNED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    inserted = c.filter(k % 101 == 0).select(
        (-(k + 1)).alias("c_custkey"),
        F.concat(F.lit("Customer#new"), k.cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    new = changed.unionByName(inserted)
    cs = snapshot_diff(
        c, new, ["c_custkey"], ["c_name", "c_acctbal", "c_mktsegment"]
    )
    return apply_changeset(
        c, cs, ["c_custkey"], ["c_name", "c_acctbal", "c_mktsegment"]
    ).orderBy("c_custkey")


REL24_SQL = """
SELECT c_custkey, c_name,
       CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100 ELSE c_acctbal END
         AS c_acctbal,
       CASE WHEN c_custkey % 29 = 0 THEN 'CHURNED' ELSE c_mktsegment END
         AS c_mktsegment
FROM customer WHERE c_custkey % 97 <> 0
UNION ALL
SELECT -(c_custkey + 1), 'Customer#new' || c_custkey, 0.0, 'NEW'
FROM customer WHERE c_custkey % 101 = 0
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# tx18 — Unicode script detection
# ---------------------------------------------------------------------------


def tx18_script_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc writing-system profile + dominant script
    (text/analysis.py script_profile): regexp_extract_all counts over
    Unicode block ranges, scan-stage only."""
    from bioeco_portal_etl_spark.text.analysis import script_profile

    d = T(spark, sf, "documents")
    return script_profile(d, "doc_id", "text").orderBy("doc_id")


def _tx18_sql() -> str:
    from bioeco_portal_etl_spark.text.analysis import SCRIPT_RANGES

    cols = ", ".join(
        f"len(regexp_extract_all(text, '[{duck_rng}]'))::BIGINT AS n_{name}"
        for name, _, duck_rng in SCRIPT_RANGES
    )
    order = [name for name, _, _ in SCRIPT_RANGES]
    # reverse fold matching the Spark side: earlier scripts win ties
    pick = "'none'"
    best = "0"
    for name in reversed(order):
        pick = f"CASE WHEN n_{name} >= {best} THEN '{name}' ELSE {pick} END"
        best = f"greatest(n_{name}, {best})" if best != "0" else f"n_{name}"
    zero = " AND ".join(f"n_{n} = 0" for n in order)
    return f"""
WITH c AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id, {', '.join('n_' + n for n in order)},
       CASE WHEN {zero} THEN 'none' ELSE {pick} END AS script
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tx19 — boilerplate n-gram coverage
# ---------------------------------------------------------------------------


def tx19_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Template-contamination coverage per doc (text/analysis.py
    boilerplate_coverage): occurrence shingles vs the corpus shingle-df
    table, joined on the posting shard key."""
    from bioeco_portal_etl_spark.text.analysis import boilerplate_coverage

    d = T(spark, sf, "documents")
    return boilerplate_coverage(d, "doc_id", "text").orderBy("doc_id")


def _tx19_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_shingles, duck_tokens

    return f"""
WITH occ AS (
  SELECT doc_id,
         unnest({duck_shingles(duck_tokens("text"), 3, distinct=False)}) AS s
  FROM documents
),
dfreq AS (
  SELECT s, count(*)::BIGINT AS docs
  FROM (SELECT DISTINCT doc_id, s FROM occ) GROUP BY s
)
SELECT o.doc_id,
       count(*)::BIGINT AS n_shingles,
       sum((d.docs > 3)::INT)::BIGINT AS n_boiler,
       ((10000 * sum((d.docs > 3)::INT)) // count(*))::BIGINT AS coverage_e4
FROM occ o JOIN dfreq d ON d.s = o.s
GROUP BY o.doc_id ORDER BY o.doc_id
"""


# ---------------------------------------------------------------------------
# gr5 — co-purchase neighborhood similarity
# ---------------------------------------------------------------------------


def gr5_node_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """Customer co-purchase similarity (graph/similarity.py node_jaccard):
    neighbor-bounded self-join with a hub-degree guard; top-100 pairs."""
    from bioeco_portal_etl_spark.graph.similarity import node_jaccard

    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
        )
    )
    return (
        # pair_partitions=512 pins the pair-expansion width in-plan so the
        # Σ deg² stream never spills at one-task-per-32nd of the data (the
        # round-4 10x probe's 13.9x outlier); AQE coalesces the surplus at
        # small SF
        node_jaccard(edges, min_common=2, max_item_degree=64, pair_partitions=512)
        .orderBy(F.desc("jaccard_e4"), "src_a", "src_b")
        .limit(100)
    )


GR5_SQL = """
WITH e AS (
  SELECT DISTINCT o_custkey AS src, l_partkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
idf AS (SELECT dst, count(*)::BIGINT AS idf FROM e GROUP BY dst),
pruned AS (SELECT e.src, e.dst FROM e JOIN idf ON idf.dst = e.dst
           WHERE idf.idf <= 64),
pairs AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*)::BIGINT AS n_common
  FROM pruned a JOIN pruned b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src HAVING count(*) >= 2
)
SELECT p.src_a, p.src_b, p.n_common, da.deg AS deg_a, db.deg AS deg_b,
       ((10000 * p.n_common) // (da.deg + db.deg - p.n_common))::BIGINT
         AS jaccard_e4
FROM pairs p
JOIN deg da ON da.src = p.src_a
JOIN deg db ON db.src = p.src_b
ORDER BY jaccard_e4 DESC, p.src_a, p.src_b
LIMIT 100
"""


# ---------------------------------------------------------------------------
# mm5 — video scene-cut detection
# ---------------------------------------------------------------------------


def mm5_scene_cuts(spark: SparkSession, sf: str) -> DataFrame:
    """Shot-boundary flags over the payload as u8 frames
    (multimodal/media.py scene_cuts): per-frame integer mean + lag
    delta, mapInPandas, first 8 frames of 64 bytes."""
    from bioeco_portal_etl_spark.multimodal.media import (
        attach_payload,
        scene_cuts,
    )

    d = T(spark, sf, "documents")
    media = attach_payload(d, "doc_id", "text")
    return scene_cuts(media, frame_bytes=64, threshold=8, max_frames=8).orderBy(
        "media_id", "frame_idx"
    )


MM5_SQL = """
WITH f AS (
  SELECT doc_id AS media_id,
         unnest(range(0, least(8, (length(text) + 63) // 64))) AS frame_idx,
         text
  FROM documents
),
m AS (
  SELECT media_id, frame_idx,
         (list_sum(list_transform(
            range(1, length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) + 1),
            j -> unicode(substr(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64), CAST(j AS INT), 1))
          )) // length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)))::BIGINT
           AS mean_u8
  FROM f
),
lagged AS (
  SELECT media_id, frame_idx, mean_u8,
         lag(mean_u8) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev
  FROM m
)
SELECT media_id, frame_idx, mean_u8,
       coalesce(abs(mean_u8 - prev) > 8, FALSE) AS is_cut
FROM lagged ORDER BY media_id, frame_idx
"""


# ---------------------------------------------------------------------------
# ts8 — MMR diversified re-rank
# ---------------------------------------------------------------------------


def ts8_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy MMR top-5 from a 20-candidate JVM shortlist per query
    (similarity/rerank.py): the diversity stage after ANN retrieval,
    sequential per query, grouped-map tier over shortlist-sized data."""
    from bioeco_portal_etl_spark.similarity.rerank import mmr_rerank

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return mmr_rerank(
        e, q, "embedding", "vec_id", k_shortlist=20, k_select=5
    ).orderBy("query_id", "sel_rank")


def _ts8_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_COS, _DUCK_VEC

    pair_cos = (
        "list_reduce(list_transform(range(1, 65), i -> x.e[i] * y.e[i]),"
        " (a, b) -> a + b) / (x.nrm * y.nrm)"
    )
    steps = []
    prev = "sel1"
    for k in range(2, 6):
        steps.append(f"""
ms{k} AS (
  SELECT s.query_id, s.id_a AS match_id, max(s.sim_e4) AS ms
  FROM sims s JOIN {prev} p ON p.query_id = s.query_id
                            AND p.match_id = s.id_b
  GROUP BY s.query_id, s.id_a
),
sc{k} AS (
  SELECT c.query_id, c.match_id, c.rel_e4,
         5000 * c.rel_e4 - 5000 * coalesce(m.ms, 0) AS mmr_e8
  FROM cand c
  LEFT JOIN ms{k} m ON m.query_id = c.query_id AND m.match_id = c.match_id
  WHERE NOT EXISTS (SELECT 1 FROM {prev} p
                    WHERE p.query_id = c.query_id
                      AND p.match_id = c.match_id)
),
pick{k} AS (
  SELECT query_id, {k}::BIGINT AS sel_rank, match_id, rel_e4, mmr_e8 FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr_e8 DESC, match_id) AS rn
    FROM sc{k}) WHERE rn = 1
),
sel{k} AS (SELECT query_id, sel_rank, match_id, rel_e4, mmr_e8 FROM {prev}
           UNION ALL SELECT * FROM pick{k})""")
        prev = f"sel{k}"
    step_sql = ",".join(steps)
    return f"""
WITH {_DUCK_VEC},
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({_DUCK_COS}) * 10000)::BIGINT AS rel_e4
  FROM (SELECT * FROM n WHERE vec_id < 10) q
  JOIN n c ON q.vec_id <> c.vec_id
),
cand AS (
  SELECT query_id, match_id, rel_e4 FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_e4 DESC, match_id) AS rn
    FROM p) WHERE rn <= 20
),
sims AS (
  SELECT a.query_id, a.match_id AS id_a, b.match_id AS id_b,
         floor(({pair_cos}) * 10000)::BIGINT AS sim_e4
  FROM cand a
  JOIN cand b ON b.query_id = a.query_id AND b.match_id <> a.match_id
  JOIN n x ON x.vec_id = a.match_id
  JOIN n y ON y.vec_id = b.match_id
),
sel1 AS (
  SELECT query_id, 1::BIGINT AS sel_rank, match_id, rel_e4,
         (5000 * rel_e4)::BIGINT AS mmr_e8
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_e4 DESC, match_id) AS rn
    FROM cand) WHERE rn = 1
),{step_sql}
SELECT query_id, sel_rank, match_id, rel_e4, mmr_e8::BIGINT AS mmr_e8
FROM sel5 ORDER BY query_id, sel_rank
"""


# ---------------------------------------------------------------------------
# x20 — equi-depth (quantile) binning
# ---------------------------------------------------------------------------


def x20_equidepth_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Decile binning of order totals (operators/stats.py equi_depth_bins):
    frequency-table boundaries, broadcast assignment."""
    from bioeco_portal_etl_spark.operators.stats import equi_depth_bins

    o = T(spark, sf, "orders")
    return equi_depth_bins(o, "o_totalprice", nbins=10).orderBy("bin")


X20_SQL = """
WITH vals AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
freq AS (SELECT v, count(*)::BIGINT AS c FROM vals GROUP BY v),
cum AS (
  SELECT v,
         (sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW))::BIGINT AS cm,
         (sum(c) OVER ())::BIGINT AS n
  FROM freq
),
bounds AS (
  SELECT b.bin,
         (SELECT min(v) FROM cum
          WHERE cm >= CAST(floor((b.bin * cum2.n + 9)::DOUBLE / 10) AS BIGINT))
           AS hi_e
  FROM (SELECT unnest(range(1, 11)) AS bin) b
  CROSS JOIN (SELECT max(n) AS n FROM cum) cum2
),
edged AS (
  SELECT bin, hi_e, lag(hi_e) OVER (ORDER BY bin) AS lo_excl FROM bounds
)
SELECT e.bin, e.hi_e, count(*)::BIGINT AS n_rows
FROM vals x JOIN edged e
  ON x.v <= e.hi_e AND (e.lo_excl IS NULL OR x.v > e.lo_excl)
GROUP BY e.bin, e.hi_e ORDER BY e.bin
"""


# ---------------------------------------------------------------------------
# dq2 — cross-table referential integrity
# ---------------------------------------------------------------------------


def dq2_referential(spark: SparkSession, sf: str) -> DataFrame:
    """FK orphan audit across the star schema: anti-join counts for
    lineitem→orders, orders→customer, customer→nation — the
    cross-table face of dq1's single-table checks. Each check is ONE
    anti join on the key (dimension sides broadcast where size-eligible);
    a healthy warehouse reports zeros, and the row format matches dq1's
    (check, value) so dashboards union them."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    checks = {
        "lineitem_orphan_orders": li.join(
            o, li.l_orderkey == o.o_orderkey, "left_anti"
        ),
        "orders_orphan_customers": o.join(
            c, o.o_custkey == c.c_custkey, "left_anti"
        ),
        "customer_orphan_nations": c.join(
            F.broadcast(n), c.c_nationkey == n.n_nationkey, "left_anti"
        ),
    }
    out = None
    for name, df in checks.items():
        one = df.agg(
            F.lit(name).alias("check"),
            F.count(F.lit(1)).alias("value"),
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("check")


DQ2_SQL = """
SELECT * FROM (
  SELECT 'lineitem_orphan_orders' AS "check",
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))::BIGINT AS value
  UNION ALL
  SELECT 'orders_orphan_customers',
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))::BIGINT
  UNION ALL
  SELECT 'customer_orphan_nations',
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey))::BIGINT
) ORDER BY "check"
"""


# ---------------------------------------------------------------------------
# rel25 — calendar gap detection (date-spine anti join)
# ---------------------------------------------------------------------------


def rel25_missing_days(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user missing-activity dates against the January 2024 calendar
    spine — the gap-detection face of time-series completeness (x11
    interpolates BETWEEN events; this reports which calendar slots have
    none at all). The 31-day spine is built IN-ROW with sequence() (no
    spine-table shuffle or cross join); activity reduces to a per-user
    distinct day set in one groupBy; the gaps are array_except(spine,
    days) exploded — so the only data-sized exchange is the (user, day)
    distinct. Bounded to the first 20 users for the gate's output."""
    e = T(spark, sf, "events")
    spine = F.transform(
        F.sequence(F.lit(0), F.lit(30)),
        lambda i: F.date_add(F.to_date(F.lit("2024-01-01")), i.cast("int")),
    )
    days = (
        e.filter(F.col("user_id") < 20)
        .select(
            F.col("user_id"),
            F.to_date(F.col("ts").cast("timestamp")).alias("d"),
        )
        .distinct()
        .groupBy("user_id")
        .agg(F.collect_set("d").alias("__days"))
    )
    return (
        days.select(
            "user_id",
            F.explode(
                F.array_sort(F.array_except(spine, F.col("__days")))
            ).alias("missing_day"),
        )
        .orderBy("user_id", "missing_day")
    )


REL25_SQL = """
WITH days AS (
  SELECT user_id, list(DISTINCT CAST(ts AS DATE)) AS ds
  FROM events WHERE user_id < 20 GROUP BY user_id
),
spine AS (
  SELECT list_transform(range(0, 31),
                        i -> DATE '2024-01-01' + CAST(i AS INT)) AS sp
)
SELECT user_id,
       unnest(list_sort(list_filter(sp, d -> NOT list_contains(ds, d))))
         AS missing_day
FROM days CROSS JOIN spine
ORDER BY user_id, missing_day
"""


# ---------------------------------------------------------------------------
# w10 — update-mode streaming aggregation converged via foreachBatch
# ---------------------------------------------------------------------------


def w10_streaming_update_counts(spark: SparkSession, sf: str) -> DataFrame:
    """The UPDATE-mode face of streaming aggregation (w9 is append):
    per-event-type count/sum where every trigger emits the CHANGED groups
    and a foreachBatch merge keeps the latest row per key — the
    convergent-table pattern behind every streaming dashboard sink
    (streaming/sink.py's JDBC upsert is the productionized form; here the
    merge target is a driver dict because the state is group-cardinality-
    sized by construction). After the drain the merged table must equal
    the batch aggregate exactly — which is what the oracle checks."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select("event_type", F.col("value").cast("decimal(18,6)").alias("v"))
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").cast("double").alias("sum_value"),
    )
    final: dict = {}

    def merge(batch_df, _batch_id):
        for r in batch_df.collect():  # group-cardinality rows, never events
            final[r["event_type"]] = (r["n_events"], r["sum_value"])

    with scoped_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(merge)
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w10 stream did not drain")
    rows = [
        (k, n, s) for k, (n, s) in sorted(final.items())
    ]
    return spark.createDataFrame(
        rows, "event_type string, n_events long, sum_value double"
    ).orderBy("event_type")


W10_SQL = """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(value::DECIMAL(18,6))::DOUBLE AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# x21 — cross-source duplication matrix
# ---------------------------------------------------------------------------


def x21_dup_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Where near-duplication comes FROM: td2's LSH pairs rolled up into a
    (source_a, source_b) matrix — the curation diagnostic that tells you
    whether dup mass is intra-crawl (same source both sides) or
    cross-source mirroring, i.e. which ingest to fix. The pair table is
    candidate-sized; the source lookup joins broadcast at any corpus
    scale (sources are a dimension)."""
    from bioeco_portal_etl_spark.text.dedupe import minhash_lsh_pairs

    d = T(spark, sf, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text")
    src = d.select("doc_id", "source")
    a = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")
    )
    b = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")
    )
    return (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def _x21_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_SH

    return f"""
WITH {_DUCK_SH},
labeled AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM cand c
  JOIN documents da ON da.doc_id = c.id_a
  JOIN documents db ON db.doc_id = c.id_b
)
SELECT source_a, source_b, count(*)::BIGINT AS n_pairs
FROM labeled GROUP BY source_a, source_b ORDER BY source_a, source_b
"""


CATALOG_EXT3: dict = {
    "rel21_attribution": (rel21_attribution, REL21_SQL),
    "rel22_cohort_retention": (rel22_cohort_retention, REL22_SQL),
    "rel23_transitions": (rel23_transitions, REL23_SQL),
    "tx15_token_entropy": (tx15_token_entropy, _tx15_sql()),
    "tx16_pmi_bigrams": (tx16_pmi_bigrams, _tx16_sql()),
    "tx17_postings": (tx17_postings, _tx17_sql()),
    "x16_histogram": (x16_histogram, X16_SQL),
    "x17_winsorize": (x17_winsorize, X17_SQL),
    "x18_cusum_drift": (x18_cusum_drift, X18_SQL),
    "sk6_sampled_quantiles": (sk6_sampled_quantiles, _sk6_sql()),
    "dq1_profile": (dq1_profile, DQ1_SQL),
    "td10_containment": (td10_containment, _td10_sql()),
    "w9_streaming_tumbling": (w9_streaming_tumbling, W9_SQL),
    "gr4_degree_hist": (gr4_degree_hist, GR4_SQL),
    "x19_group_normalize": (x19_group_normalize, X19_SQL),
    "rel24_cdc_apply": (rel24_cdc_apply, REL24_SQL),
    "tx18_script_detect": (tx18_script_detect, _tx18_sql()),
    "tx19_boilerplate": (tx19_boilerplate, _tx19_sql()),
    "gr5_node_similarity": (gr5_node_similarity, GR5_SQL),
    "mm5_scene_cuts": (mm5_scene_cuts, MM5_SQL),
    "ts8_mmr_rerank": (ts8_mmr_rerank, _ts8_sql()),
    "x20_equidepth_bins": (x20_equidepth_bins, X20_SQL),
    "w10_streaming_update_counts": (w10_streaming_update_counts, W10_SQL),
    "x21_dup_matrix": (x21_dup_matrix, _x21_sql()),
    "dq2_referential": (dq2_referential, DQ2_SQL),
    "rel25_missing_days": (rel25_missing_days, REL25_SQL),
}
