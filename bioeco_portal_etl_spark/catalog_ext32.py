"""Round-7 second batch — 5 oracle-checked entries:

- x50_ks_test: exact two-sample Kolmogorov-Smirnov statistic between the
  1995 and 1996 order-value distributions — the distribution-drift test
  PSI (dq4) approximates with bins, here EXACT: the max |ECDF_a - ECDF_b|
  is computed as an INTEGER max of |cum_a*n_b - cum_b*n_a| over distinct
  values, so no float accumulates before the single final division;
- tx42_js_divergence: Jensen-Shannon divergence between every language
  pair's term distributions — the symmetric, bounded corpus-mix distance
  (KL's pathologies on disjoint support don't apply); per-term
  contributions floor-e12-quantized before the integer sum;
- gr22_assortativity: Newman degree-assortativity coefficient of the
  same-day co-activity graph — THE one-number mixing diagnostic (r > 0:
  hubs attach to hubs; r < 0: hub-and-spoke); integer moment sums over
  the edge list, one IEEE combination at the end;
- td17_truncation_dupes: prefix-containment dedupe — documents that are
  proper PREFIXES of longer documents (the crawl-truncation duplicate
  class exact-hash dedupe misses because the bytes differ); a 32-char
  block-key join bounds candidates, never all-pairs;
- rel38_time_weighted_avg: time-weighted average of an irregular event
  series per (user, day) — the TimescaleDB-style TWA: each value is
  weighted by microseconds until the next observation (LOCF integral /
  span), all-integer (quantized value x integer duration) until one
  final floored division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# x50 — exact two-sample KS
# ---------------------------------------------------------------------------


def x50_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """KS = max_v |ECDF_a(v) - ECDF_b(v)| over o_totalprice, 1995 vs 1996
    orders. Integer-exact core: at each distinct value,
    |cum_a * n_b - cum_b * n_a| is a BIGINT; the max of those is exact,
    and the single division by n_a*n_b happens once, after the max.
    The cumulative window runs over the DISTINCT-value table (bounded by
    the value domain, not the row count); at 100 TB the same statistic
    runs on a range-partitioned two-pass prefix sum — the documented
    global-sort posture shared with x47_decile_lift (SCALING.md)."""
    return ks_test_frame(T(spark, sf, "orders"))


def ks_test_frame(orders: DataFrame) -> DataFrame:
    o = orders.select(
        F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice").cast("double") * 100.0)
        .cast("long")
        .alias("cents"),
    ).filter(F.col("yr").isin(1995, 1996))
    per_value = o.groupBy("cents").agg(
        F.sum(F.when(F.col("yr") == 1995, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0)).alias("cb"),
    )
    w = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_value.select(
        "cents",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    totals = per_value.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a")
        ).alias("d_scaled"),
    )
    return scored.groupBy("n_a", "n_b").agg(
        F.count(F.lit(1)).alias("n_distinct_values"),
        F.max("d_scaled").alias("ks_scaled"),
    ).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "n_distinct_values",
        F.floor(
            F.col("ks_scaled").cast("double")
            * 1000000.0
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        )
        .cast("long")
        .alias("ks_e6"),
    )


_X50_SQL = """
WITH o AS (
  SELECT year(o_orderdate) AS yr,
         floor(CAST(o_totalprice AS DOUBLE) * 100.0)::BIGINT AS cents
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
),
per_value AS (
  SELECT cents,
         sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM o GROUP BY cents
),
cum AS (
  SELECT cents,
         sum(ca) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cuma,
         sum(cb) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cumb
  FROM per_value
),
totals AS (
  SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM per_value
)
SELECT t.n_a, t.n_b,
       count(*)::BIGINT AS n_distinct_values,
       floor(CAST(max(abs(c.cuma * t.n_b - c.cumb * t.n_a)) AS DOUBLE)
             * 1000000.0
             / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)))::BIGINT
         AS ks_e6
FROM cum c CROSS JOIN totals t
GROUP BY t.n_a, t.n_b"""


# ---------------------------------------------------------------------------
# tx42 — Jensen-Shannon divergence between language pairs
# ---------------------------------------------------------------------------


def tx42_js_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """JS(p_la || p_lb) over unigram term distributions for every
    language pair — bounded in [0, 1] bit, symmetric, finite on disjoint
    support (a term absent from one side contributes p*log2(2) = p).
    Per-term contributions are computed in IEEE doubles with pinned
    literals and floor-e12-quantized BEFORE the sum, so cross-partition
    float order cannot flip the hash. Term tables are Heaps-bounded;
    the pair grid is |langs|^2 rows, a broadcast."""
    return js_divergence_frame(
        T(spark, sf, "documents").select(
            F.coalesce("lang", F.lit("und")).alias("grp"), "text"
        )
    )


def js_divergence_frame(docs: DataFrame) -> DataFrame:
    from bioeco_portal_etl_spark.text.tokenize import tokens

    terms = (
        docs.select("grp", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("grp", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = terms.groupBy("grp").agg(F.sum("c").alias("tot"))
    pairs = (
        totals.select(F.col("grp").alias("grp_a"), F.col("tot").alias("tot_a"))
        .crossJoin(
            F.broadcast(
                totals.select(
                    F.col("grp").alias("grp_b"), F.col("tot").alias("tot_b")
                )
            )
        )
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    # union-of-support term grid per pair
    support = (
        pairs.join(
            terms.select(F.col("grp").alias("g"), "t").distinct(),
            (F.col("g") == F.col("grp_a")) | (F.col("g") == F.col("grp_b")),
        )
        .select("grp_a", "grp_b", "tot_a", "tot_b", "t")
        .distinct()
    )
    ca = terms.select(
        F.col("grp").alias("grp_a"), F.col("t").alias("ta"), F.col("c").alias("c_a")
    )
    cb = terms.select(
        F.col("grp").alias("grp_b"), F.col("t").alias("tb"), F.col("c").alias("c_b")
    )
    j = (
        support.join(
            ca, (support.grp_a == ca.grp_a) & (support.t == ca.ta), "left"
        )
        .drop(ca.grp_a)
        .drop("ta")
        .join(cb, (support.grp_b == cb.grp_b) & (support.t == cb.tb), "left")
        .drop(cb.grp_b)
        .drop("tb")
    )
    pa = F.coalesce(F.col("c_a"), F.lit(0)).cast("double") / F.col(
        "tot_a"
    ).cast("double")
    pb = F.coalesce(F.col("c_b"), F.lit(0)).cast("double") / F.col(
        "tot_b"
    ).cast("double")
    mm = (pa + pb) / F.lit(2.0)
    contrib = F.when(pa > 0, pa * F.log2(pa / mm)).otherwise(
        F.lit(0.0)
    ) + F.when(pb > 0, pb * F.log2(pb / mm)).otherwise(F.lit(0.0))
    q = j.select(
        "grp_a",
        "grp_b",
        F.floor(contrib * 1000000000000.0).cast("long").alias("cq"),
    )
    return (
        q.groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("cq").alias("sq"))
        .select(
            "grp_a",
            "grp_b",
            "n_terms",
            # JS = sum/2; e6 surface from the e12 quantized sum
            F.floor(F.col("sq").cast("double") / 2000000.0)
            .cast("long")
            .alias("js_e6"),
        )
        .orderBy("grp_a", "grp_b")
    )


def _tx42_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH docs AS (
  SELECT coalesce(lang, 'und') AS grp, text FROM documents
),
terms AS (
  SELECT grp, t, count(*)::BIGINT AS c
  FROM (SELECT grp, unnest({duck_tokens("text")}) AS t FROM docs)
  GROUP BY grp, t
),
totals AS (SELECT grp, sum(c)::BIGINT AS tot FROM terms GROUP BY grp),
pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b, a.tot AS tot_a, b.tot AS tot_b
  FROM totals a JOIN totals b ON a.grp < b.grp
),
support AS (
  SELECT DISTINCT p.grp_a, p.grp_b, p.tot_a, p.tot_b, u.t
  FROM pairs p
  JOIN (SELECT DISTINCT grp AS g, t FROM terms) u
    ON u.g = p.grp_a OR u.g = p.grp_b
),
j AS (
  SELECT s.grp_a, s.grp_b, s.tot_a, s.tot_b, s.t,
         coalesce(ca.c, 0)::BIGINT AS c_a, coalesce(cb.c, 0)::BIGINT AS c_b
  FROM support s
  LEFT JOIN terms ca ON ca.grp = s.grp_a AND ca.t = s.t
  LEFT JOIN terms cb ON cb.grp = s.grp_b AND cb.t = s.t
),
q AS (
  SELECT grp_a, grp_b,
         floor((
           CASE WHEN c_a > 0 THEN
             (CAST(c_a AS DOUBLE) / CAST(tot_a AS DOUBLE))
             * log2((CAST(c_a AS DOUBLE) / CAST(tot_a AS DOUBLE))
                    / (((CAST(c_a AS DOUBLE) / CAST(tot_a AS DOUBLE))
                        + (CAST(c_b AS DOUBLE) / CAST(tot_b AS DOUBLE)))
                       / 2.0))
           ELSE 0.0 END
           +
           CASE WHEN c_b > 0 THEN
             (CAST(c_b AS DOUBLE) / CAST(tot_b AS DOUBLE))
             * log2((CAST(c_b AS DOUBLE) / CAST(tot_b AS DOUBLE))
                    / (((CAST(c_a AS DOUBLE) / CAST(tot_a AS DOUBLE))
                        + (CAST(c_b AS DOUBLE) / CAST(tot_b AS DOUBLE)))
                       / 2.0))
           ELSE 0.0 END
         ) * 1000000000000.0)::BIGINT AS cq
  FROM j
)
SELECT grp_a, grp_b, count(*)::BIGINT AS n_terms,
       floor(CAST(sum(cq)::BIGINT AS DOUBLE) / 2000000.0)::BIGINT AS js_e6
FROM q GROUP BY grp_a, grp_b ORDER BY grp_a, grp_b"""


# ---------------------------------------------------------------------------
# gr22 — degree assortativity
# ---------------------------------------------------------------------------


def gr22_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Newman degree-assortativity r of the same-day customer
    co-activity graph: Pearson correlation of (deg(u), deg(v)) over the
    DIRECTED edge list (both orientations present, so the symmetric
    formula needs no half-weights). Degrees come from one groupBy of the
    persisted edge list; moment sums are BIGINTs (each < 2^53, exact as
    doubles); the final combination is IEEE, spelled identically in the
    oracle."""
    orders = T(spark, sf, "orders")
    o = orders.select("o_custkey", "o_orderdate")
    a, b = o.alias("a"), o.alias("b")
    edges = (
        a.join(b, "o_orderdate")
        .filter(F.col("a.o_custkey") != F.col("b.o_custkey"))
        .select(
            F.col("a.o_custkey").alias("src"),
            F.col("b.o_custkey").alias("dst"),
        )
        .distinct()
    )
    return assortativity_frame(edges)


def assortativity_frame(edges: DataFrame) -> DataFrame:
    """Frame-level body of gr22 over a directed, deduplicated,
    symmetric (src, dst) edge list."""
    e = edges.persist()  # degrees + the annotated join both consume it
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dj = (
        e.join(
            F.broadcast(deg.select(F.col("src").alias("u"), F.col("deg").alias("j"))),
            e.src == F.col("u"),
        )
        .join(
            F.broadcast(deg.select(F.col("src").alias("v"), F.col("deg").alias("k"))),
            e.dst == F.col("v"),
        )
        .select("j", "k")
    )
    agg = dj.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum("j").alias("sj"),
        F.sum("k").alias("sk"),
        F.sum(F.col("j") * F.col("j")).alias("sj2"),
        F.sum(F.col("k") * F.col("k")).alias("sk2"),
    )
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    md = F.col("m").cast("double")
    num = md * F.col("sjk").cast("double") - F.col("sj").cast(
        "double"
    ) * F.col("sk").cast("double")
    den = F.sqrt(
        md * F.col("sj2").cast("double")
        - F.col("sj").cast("double") * F.col("sj").cast("double")
    ) * F.sqrt(
        md * F.col("sk2").cast("double")
        - F.col("sk").cast("double") * F.col("sk").cast("double")
    )
    return agg.crossJoin(F.broadcast(nodes)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("m").cast("long").alias("n_directed_edges"),
        F.when(den > 0, F.floor(num / den * 1000000.0).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("assortativity_e6"),
    )


_GR22_SQL = """
WITH e AS (
  SELECT DISTINCT a.o_custkey AS src, b.o_custkey AS dst
  FROM orders a JOIN orders b ON a.o_orderdate = b.o_orderdate
  WHERE a.o_custkey <> b.o_custkey
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
dj AS (
  SELECT du.deg AS j, dv.deg AS k
  FROM e
  JOIN deg du ON du.src = e.src
  JOIN deg dv ON dv.src = e.dst
),
agg AS (
  SELECT count(*)::BIGINT AS m,
         sum(j * k)::BIGINT AS sjk,
         sum(j)::BIGINT AS sj, sum(k)::BIGINT AS sk,
         sum(j * j)::BIGINT AS sj2, sum(k * k)::BIGINT AS sk2
  FROM dj
),
nodes AS (SELECT count(*)::BIGINT AS n_nodes FROM deg)
SELECT n.n_nodes, a.m AS n_directed_edges,
       CASE WHEN (sqrt(CAST(a.m AS DOUBLE) * CAST(a.sj2 AS DOUBLE)
                       - CAST(a.sj AS DOUBLE) * CAST(a.sj AS DOUBLE))
                  * sqrt(CAST(a.m AS DOUBLE) * CAST(a.sk2 AS DOUBLE)
                         - CAST(a.sk AS DOUBLE) * CAST(a.sk AS DOUBLE))) > 0
       THEN floor((CAST(a.m AS DOUBLE) * CAST(a.sjk AS DOUBLE)
                   - CAST(a.sj AS DOUBLE) * CAST(a.sk AS DOUBLE))
                  / (sqrt(CAST(a.m AS DOUBLE) * CAST(a.sj2 AS DOUBLE)
                          - CAST(a.sj AS DOUBLE) * CAST(a.sj AS DOUBLE))
                     * sqrt(CAST(a.m AS DOUBLE) * CAST(a.sk2 AS DOUBLE)
                            - CAST(a.sk AS DOUBLE) * CAST(a.sk AS DOUBLE)))
                  * 1000000.0)::BIGINT
       ELSE NULL END AS assortativity_e6
FROM agg a CROSS JOIN nodes n"""


# ---------------------------------------------------------------------------
# td17 — truncation (proper-prefix) duplicates
# ---------------------------------------------------------------------------


def td17_truncation_dupes(spark: SparkSession, sf: str) -> DataFrame:
    """Documents that are proper PREFIXES of longer documents — the
    crawl-truncation duplicate class: same page fetched twice, once cut
    off, so content hashes differ and exact dedupe misses it. Candidates
    are blocked on the first 32 characters (every proper-prefix pair
    with len >= 32 shares that block; the corpus min length is 44), then
    verified with one substring equality — a bounded equi-join, never
    all-pairs, the td2 banding idea applied to containment-by-prefix."""
    return truncation_dupes_frame(
        T(spark, sf, "documents").select("doc_id", "text")
    )


def truncation_dupes_frame(docs: DataFrame) -> DataFrame:
    d = docs.select(
        "doc_id",
        "text",
        F.length("text").alias("len"),
        F.substring("text", 1, 32).alias("blk"),
    )
    short = d.select(
        F.col("doc_id").alias("short_id"),
        F.col("text").alias("short_text"),
        F.col("len").alias("len_short"),
        "blk",
    )
    long_ = d.select(
        F.col("doc_id").alias("long_id"),
        F.col("text").alias("long_text"),
        F.col("len").alias("len_long"),
        "blk",
    )
    return (
        short.join(long_, "blk")
        .filter(
            (F.col("len_short") < F.col("len_long"))
            & (
                F.expr("substring(long_text, 1, len_short)")
                == F.col("short_text")
            )
        )
        .select("short_id", "long_id", "len_short", "len_long")
        .orderBy("short_id", "long_id")
    )


_TD17_SQL = """
WITH d AS (
  SELECT doc_id, text, length(text)::BIGINT AS len,
         substr(text, 1, 32) AS blk
  FROM documents
)
SELECT s.doc_id AS short_id, l.doc_id AS long_id,
       s.len AS len_short, l.len AS len_long
FROM d s JOIN d l ON s.blk = l.blk
WHERE s.len < l.len AND substr(l.text, 1, CAST(s.len AS INT)) = s.text
ORDER BY short_id, long_id"""


# ---------------------------------------------------------------------------
# rel38 — time-weighted average (TWA)
# ---------------------------------------------------------------------------


def rel38_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """TimescaleDB-style time-weighted average per (user, day): each
    observation's value holds until the next observation (LOCF), so the
    average is integral/span — the honest mean for irregular telemetry,
    where the arithmetic mean over-weights bursts. All-integer core:
    e4-quantized value x integer microsecond duration, one floored
    division per group. Groups whose events all share one timestamp
    (span 0) are dropped — no integral exists."""
    return time_weighted_avg_frame(
        T(spark, sf, "events").filter(F.col("user_id") < 50)
    )


def time_weighted_avg_frame(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    e = events.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        # session tz is UTC, so the NTZ -> LTZ cast is the identity and
        # unix_micros matches DuckDB's epoch_us (the sessions.py idiom)
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 10000.0).cast("long").alias("vq"),
    ).withColumn("next_us", F.lead("ts_us").over(w))
    seg = e.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        "day",
        "vq",
        (F.col("next_us") - F.col("ts_us")).alias("dur_us"),
    )
    return (
        seg.groupBy("user_id", "day")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_events"),
            F.sum("dur_us").alias("span_us"),
            F.sum(F.col("vq") * F.col("dur_us")).alias("wsum"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("span_us").cast("long").alias("span_us"),
            F.floor(
                F.col("wsum").cast("double") / F.col("span_us").cast("double")
            )
            .cast("long")
            .alias("twa_e4"),
        )
        .orderBy("user_id", "day")
    )


_REL38_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS ts_us, event_id,
         floor(value * 10000.0)::BIGINT AS vq
  FROM events WHERE user_id < 50
),
led AS (
  SELECT user_id, day, vq, ts_us,
         lead(ts_us) OVER (PARTITION BY user_id, day
                           ORDER BY ts_us, event_id) AS next_us
  FROM e
),
seg AS (
  SELECT user_id, day, vq, (next_us - ts_us)::BIGINT AS dur_us
  FROM led WHERE next_us IS NOT NULL
)
SELECT user_id, day,
       (count(*) + 1)::BIGINT AS n_events,
       sum(dur_us)::BIGINT AS span_us,
       floor(CAST(sum(vq * dur_us)::BIGINT AS DOUBLE)
             / CAST(sum(dur_us)::BIGINT AS DOUBLE))::BIGINT AS twa_e4
FROM seg GROUP BY user_id, day
HAVING sum(dur_us) > 0
ORDER BY user_id, day"""


CATALOG_EXT32 = {
    "x50_ks_test": (x50_ks_test, _X50_SQL),
    "tx42_js_divergence": (tx42_js_divergence, _tx42_sql()),
    "gr22_assortativity": (gr22_assortativity, _GR22_SQL),
    "td17_truncation_dupes": (td17_truncation_dupes, _TD17_SQL),
    "rel38_time_weighted_avg": (rel38_time_weighted_avg, _REL38_SQL),
}
