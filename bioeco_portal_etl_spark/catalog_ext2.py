"""Round-4 catalog extensions: distributed sketches (sk*), graph
algorithms (gr*), robust/streaky relational patterns (rel16+), and
weighted-sampling / anomaly / corpus-diagnostic training ops (x12+, tx12).

Same contract as catalog.py: every entry is a (spark_fn, oracle_sql)
pair over the driver's synthetic tables, aliased identically on both
sides, ending in a deterministic ORDER BY. Estimators are engine-exact
by construction (md5-derived hashes, integer fixed-point, single-rounding
IEEE chains — see sketches/__init__.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# sk1 — KMV distinct-count sketch
# ---------------------------------------------------------------------------


def sk1_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k=64) distinct customers per order priority, alongside the
    exact count the sketch replaces (sketches/kmv.py). The exact column
    is the demo yardstick — production keeps only the sketch, whose
    per-group state is 64 longs instead of the full distinct key set."""
    from bioeco_portal_etl_spark.sketches.kmv import kmv_distinct

    o = T(spark, sf, "orders")
    est = kmv_distinct(o, ["o_orderpriority"], "o_custkey", k=64)
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("true_distinct")
    )
    return est.join(exact, "o_orderpriority").orderBy("o_orderpriority")


def _sk1_sql() -> str:
    from bioeco_portal_etl_spark.sketches.kmv import duck_kmv_distinct

    return f"""
WITH {duck_kmv_distinct("orders", "o_orderpriority", "o_custkey", 64)},
exact AS (
  SELECT o_orderpriority, count(DISTINCT o_custkey) AS true_distinct
  FROM orders GROUP BY o_orderpriority
)
SELECT k.grp AS o_orderpriority, k.est_distinct, e.true_distinct
FROM kmv k JOIN exact e ON e.o_orderpriority = k.grp
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# sk2 — Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------


def sk2_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 suppliers by CMS-estimated lineitem frequency (d=4, w=256 —
    an 8 KB grid standing in for the full per-supplier count), with the
    true count as the one-sided-error witness: est_cnt >= true_cnt always
    (sketches/cms.py). Grid build is one bounded-state shuffle; estimates
    are a broadcast join."""
    from bioeco_portal_etl_spark.sketches.cms import cms_build, cms_estimate

    li = T(spark, sf, "lineitem")
    grid = cms_build(li, "l_suppkey", d=4, w=256)
    keys = T(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("suppkey")
    )
    est = cms_estimate(keys, grid, "suppkey", d=4, w=256)
    true = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    return (
        est.join(true, "suppkey", "left")
        .select(
            "suppkey",
            "est_cnt",
            F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        )
        .orderBy(F.desc("est_cnt"), "suppkey")
        .limit(20)
    )


def _sk2_sql() -> str:
    from bioeco_portal_etl_spark.sketches.cms import duck_cms

    return f"""
WITH {duck_cms("lineitem", "l_suppkey", "supplier", "s_suppkey", 4, 256)},
truec AS (
  SELECT l_suppkey AS suppkey, count(*) AS true_cnt FROM lineitem GROUP BY l_suppkey
)
SELECT c.key AS suppkey, c.est_cnt, coalesce(t.true_cnt, 0) AS true_cnt
FROM cms_est c LEFT JOIN truec t ON t.suppkey = c.key
ORDER BY est_cnt DESC, suppkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# sk3 — HyperLogLog distinct
# ---------------------------------------------------------------------------


def sk3_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-HLL (m=64) distinct parts per returnflag vs the exact count
    (sketches/hll.py): per-group state is 64 max-rank registers that
    merge by pointwise max across any partitioning of the scan."""
    from bioeco_portal_etl_spark.sketches.hll import hll_estimate, hll_registers

    li = T(spark, sf, "lineitem")
    regs = hll_registers(li, ["l_returnflag"], "l_partkey")
    est = hll_estimate(regs, ["l_returnflag"])
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("true_distinct")
    )
    return est.join(exact, "l_returnflag").orderBy("l_returnflag")


def _sk3_sql() -> str:
    from bioeco_portal_etl_spark.sketches.hll import duck_hll

    return f"""
WITH {duck_hll("lineitem", "l_returnflag", "l_partkey")},
exact AS (
  SELECT l_returnflag, count(DISTINCT l_partkey) AS true_distinct
  FROM lineitem GROUP BY l_returnflag
)
SELECT h.grp AS l_returnflag, h.est_distinct, e.true_distinct
FROM hll h JOIN exact e ON e.l_returnflag = h.grp
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# sk4 — Bloom membership gate (md5 family, oracle-checkable)
# ---------------------------------------------------------------------------

_BLOOM_M, _BLOOM_K = 8192, 3


def sk4_bloom_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-gate every document against the 'history' slice (doc_id % 7
    == 0), keyed by content (sketches/bloom_md5.py). actually_seen is the
    exact semi-join truth: possibly_seen implies-nothing-missed (no false
    negatives) while the deterministic false positives stay visible —
    both engines rebuild the identical bitset, so even the FPs hash-match."""
    from bioeco_portal_etl_spark.sketches.bloom_md5 import (
        bloom_build_md5,
        bloom_contains_md5,
    )

    d = T(spark, sf, "documents")
    history = d.filter(F.col("doc_id") % 7 == 0).select(F.col("text"))
    bloom = bloom_build_md5(history, "text", _BLOOM_M, _BLOOM_K)
    gated = bloom_contains_md5(
        d.select("doc_id", "text"), bloom, "text", _BLOOM_M, _BLOOM_K
    )
    truth = history.distinct().withColumn("actually_seen", F.lit(True))
    return (
        gated.join(truth, "text", "left")
        .select(
            "doc_id",
            "possibly_seen",
            F.coalesce("actually_seen", F.lit(False)).alias("actually_seen"),
        )
        .orderBy("doc_id")
    )


def _sk4_sql() -> str:
    from bioeco_portal_etl_spark.sketches.bloom_md5 import duck_bloom

    return f"""
WITH {duck_bloom(
        "SELECT text AS key FROM documents WHERE doc_id % 7 = 0",
        "documents",
        "text",
        _BLOOM_M,
        _BLOOM_K,
    )}
SELECT d.doc_id, b.possibly_seen,
       d.text IN (SELECT key FROM hkeys) AS actually_seen
FROM documents d JOIN bloomed b ON b.key = d.text
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# gr1/gr2 — graph: PageRank + triangles over the co-order supplier graph
# ---------------------------------------------------------------------------

_EDGES_SQL = """
SELECT a.l_suppkey AS src, b.l_suppkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
"""


def _co_order_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Directed co-order supplier edges: (s1 -> s2) iff both supply the
    same order. The self-join key is l_orderkey (bounded fan-out: order
    line counts are small constants), so the join shuffles once on the
    order key and never explodes on a hub vertex."""
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
    )


def gr1_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """3-iteration e9 fixed-point PageRank (graph/pagerank.py) over the
    co-order supplier graph; top 20 by rank. Integer mass transfer makes
    the ranks bit-identical to the DuckDB unrolled-CTE mirror."""
    from bioeco_portal_etl_spark.graph.pagerank import pagerank

    ranks = pagerank(_co_order_edges(spark, sf), iterations=3)
    return ranks.orderBy(F.desc("pr_e9"), "node").limit(20)


def _gr1_sql() -> str:
    from bioeco_portal_etl_spark.graph.pagerank import duck_pagerank

    return f"""
WITH {duck_pagerank(_EDGES_SQL, 3)}
SELECT node, pr_e9 FROM pr3 ORDER BY pr_e9 DESC, node LIMIT 20
"""


def gr2_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Degree-oriented triangle count (graph/triangles.py) over the
    co-order supplier graph of the 1%-order slice: one row (n_nodes,
    n_edges, n_wedges, n_triangles); n_wedges witnesses the orientation
    bound that keeps the wedge join off the curse-of-the-last-reducer
    path. The slice is the FIXTURE, not the operator: the synthetic
    co-order graph is near-complete (avg degree ~0.9|V| at sf0.1), where
    triangle counting is inherently Θ(E^{3/2}) — ~3*10^8 wedges — so the
    unsliced run measures the data generator's density, not the plan.
    The orientation bound is what makes the same plan safe on REAL
    power-law graphs at 100 TB (Suri & Vassilvitskii 2011)."""
    from bioeco_portal_etl_spark.graph.triangles import triangle_stats

    li = T(spark, sf, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    src = li.select("l_orderkey", "l_suppkey")
    a, b = src.alias("a"), src.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
    )
    return triangle_stats(edges)


_EDGES_1PCT_SQL = """
SELECT a.l_suppkey AS src, b.l_suppkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
WHERE a.l_orderkey % 100 = 0
"""


def _gr2_sql() -> str:
    from bioeco_portal_etl_spark.graph.triangles import duck_triangles

    return f"""
WITH {duck_triangles(_EDGES_1PCT_SQL)}
SELECT n_nodes, n_edges, n_wedges, n_triangles FROM tri
"""


# ---------------------------------------------------------------------------
# rel16 — robust stats (median/MAD by rank selection)
# ---------------------------------------------------------------------------


def rel16_median_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation lower-median and MAD of customer balances
    (operators/robust.py) — rank selection instead of percentile_cont so
    both statistics are exact data values, immune to the interpolation
    formula differences between engines."""
    from bioeco_portal_etl_spark.operators.robust import median_mad

    c = T(spark, sf, "customer").select("c_nationkey", "c_acctbal", "c_custkey")
    return (
        median_mad(c, ["c_nationkey"], "c_acctbal", "c_custkey")
        .select(
            "c_nationkey",
            "n",
            F.round("median", 2).alias("median_bal"),
            F.round("mad", 2).alias("mad_bal"),
        )
        .orderBy("c_nationkey")
    )


REL16_SQL = """
WITH ranked AS (
  SELECT c_nationkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
),
med AS (
  SELECT c_nationkey, n, c_acctbal AS median FROM ranked WHERE rn = (n + 1) // 2
),
devr AS (
  SELECT c.c_nationkey, abs(c.c_acctbal - m.median) AS dev,
         row_number() OVER (
           PARTITION BY c.c_nationkey
           ORDER BY abs(c.c_acctbal - m.median), c.c_custkey) AS rn,
         count(*) OVER (PARTITION BY c.c_nationkey) AS n
  FROM customer c JOIN med m ON m.c_nationkey = c.c_nationkey
),
mad AS (
  SELECT c_nationkey, dev AS mad FROM devr WHERE rn = (n + 1) // 2
)
SELECT m.c_nationkey, m.n, round(m.median, 2) AS median_bal,
       round(d.mad, 2) AS mad_bal
FROM med m JOIN mad d ON d.c_nationkey = m.c_nationkey
ORDER BY m.c_nationkey
"""


# ---------------------------------------------------------------------------
# rel17 — gaps and islands
# ---------------------------------------------------------------------------


def rel17_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Consecutive same-event-type runs per user (operators/islands.py):
    value-change run detection, the companion to time-gap sessionize.
    Runs of length 1 are noise here — keep n_rows >= 2."""
    from bioeco_portal_etl_spark.operators.islands import islands

    e = T(spark, sf, "events").select("user_id", "event_type", "ts", "event_id")
    return (
        islands(e, ["user_id"], "event_type", ["ts", "event_id"])
        .filter(F.col("n_rows") >= 2)
        .orderBy("user_id", "run_start", "event_type")
    )


REL17_SQL = """
WITH marked AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS island
  FROM events
)
SELECT user_id, event_type,
       min(ts) AS run_start, max(ts) AS run_end, count(*) AS n_rows
FROM marked
GROUP BY user_id, event_type, island
HAVING count(*) >= 2
ORDER BY user_id, run_start, event_type
"""


# ---------------------------------------------------------------------------
# x12 — weighted (priority) sampling
# ---------------------------------------------------------------------------


def x12_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted 10-per-source document sample
    (operators/sampling.py priority_sample): the reproducible
    quality-weighted subsampling step of a data-mix recipe — hash-derived
    priorities, no RNG, stable under reruns and engines."""
    from bioeco_portal_etl_spark.operators.sampling import priority_sample

    d = T(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return (
        priority_sample(d, "source", "doc_id", "n_chars", k=10)
        .select("source", "rank", "doc_id", "n_chars")
        .orderBy("source", "rank")
    )


def _x12_sql() -> str:
    from bioeco_portal_etl_spark.sketches import H60_DOMAIN, duck_h60

    h = duck_h60("'ps:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH pri AS (
  SELECT source, doc_id, n_chars,
         CAST(n_chars AS DOUBLE) * {float(H60_DOMAIN)!r} / {h} AS q
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rank
  FROM pri
)
SELECT source, rank, doc_id, n_chars
FROM ranked WHERE rank <= 10
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# x13 — rolling z-score anomaly gate
# ---------------------------------------------------------------------------


def x13_rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-window z-score outliers per user
    (operators/timeseries.py): events whose value sits > 2.5 sigma from
    the 10 prior events' mean. Fixed-point frame sums keep the score
    bit-identical across engines."""
    from bioeco_portal_etl_spark.operators.timeseries import rolling_zscore

    e = T(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    scored = rolling_zscore(
        e, ["user_id"], ["ts", "event_id"], "value", window_rows=10, min_rows=5
    )
    return (
        scored.filter(F.col("is_anomaly"))
        .select("event_id", "user_id", F.round("value", 2).alias("value"), "z")
        .orderBy("event_id")
    )


X13_SQL = """
WITH q AS (
  SELECT event_id, user_id, value,
         CAST(floor(value * 100) AS BIGINT) AS v_e2,
         count(*) OVER w AS n,
         sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS s1,
         sum(CAST(floor(value * 100) AS BIGINT) * CAST(floor(value * 100) AS BIGINT)) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_id, user_id, value,
         round((v_e2 - s1 / n) / sqrt((n * s2 - s1 * s1) / (n * n)), 4) AS z
  FROM q
  WHERE n >= 5 AND n * s2 - s1 * s1 > 0
)
SELECT event_id, user_id, round(value, 2) AS value, z
FROM z WHERE abs(z) > 2.5
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# tx12 — per-source vocabulary growth / Zipf diagnostics
# ---------------------------------------------------------------------------


def tx12_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source Zipf/Heaps fingerprint (text/analysis.py vocab_growth):
    token mass, type counts, hapax fraction, top-10 head share."""
    from bioeco_portal_etl_spark.text.analysis import vocab_growth

    d = T(spark, sf, "documents")
    return vocab_growth(d, "source", "text", top_k=10).orderBy("source")


def _tx12_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH tok AS (
  SELECT source, unnest({duck_tokens("text")}) AS t FROM documents
),
tf AS (
  SELECT source, t, count(*) AS tfc FROM tok GROUP BY source, t
),
ranked AS (
  SELECT source, tfc,
         row_number() OVER (PARTITION BY source ORDER BY tfc DESC, t) AS rk
  FROM tf
)
SELECT source,
       CAST(sum(tfc) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       CAST(sum(CASE WHEN tfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types,
       CAST((1000000 * count(*)) // sum(tfc) AS BIGINT) AS ttr_e6,
       CAST((1000000 * sum(CASE WHEN rk <= 10 THEN tfc ELSE 0 END)) // sum(tfc)
         AS BIGINT) AS top_share_e6
FROM ranked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# sk5 — KMV sketch set operations (union / intersection estimates)
# ---------------------------------------------------------------------------


def sk5_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Union/intersection cardinality estimates for the URGENT vs LOW
    customer sets from their MERGED KMV sketches (sketches/kmv.py
    kmv_set_ops) — the compose-without-rescanning property that lets
    per-partition sketches answer cross-slice overlap questions. Exact
    counts ride along as the yardstick."""
    from bioeco_portal_etl_spark.sketches.kmv import kmv_set_ops

    o = T(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    est = kmv_set_ops(a, b, "o_custkey", k=64)
    tu = (
        a.unionByName(b)
        .distinct()
        .agg(F.count(F.lit(1)).alias("true_union"))
    )
    ti = a.distinct().intersect(b.distinct()).agg(
        F.count(F.lit(1)).alias("true_intersection")
    )
    return est.crossJoin(F.broadcast(tu)).crossJoin(F.broadcast(ti))


def _sk5_sql() -> str:
    from bioeco_portal_etl_spark.sketches.kmv import duck_kmv_set_ops

    a = "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
    b = "(SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')"
    return f"""
WITH {duck_kmv_set_ops(a, b, "o_custkey", 64)}
SELECT est_union, est_intersection,
       (SELECT count(DISTINCT o_custkey) FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')) AS true_union,
       (SELECT count(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )) AS true_intersection
FROM kmvset
"""


# ---------------------------------------------------------------------------
# rel18 — interval union (merge overlapping spans)
# ---------------------------------------------------------------------------


def rel18_interval_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Merge overlapping per-user activity spans
    (operators/intervals.py): each event opens a span of 60 + (event_id %
    540) seconds; overlapping-or-touching spans coalesce into availability
    windows. Interval arithmetic stays NTZ on both engines."""
    from bioeco_portal_etl_spark.operators.intervals import merge_intervals

    e = T(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("span_start"),
        (
            F.col("ts")
            + F.expr("make_interval(0, 0, 0, 0, 0, 0, 60 + event_id % 540)")
        ).alias("span_end"),
    )
    return (
        merge_intervals(e, ["user_id"], "span_start", "span_end", "event_id")
        .orderBy("user_id", "merge_start")
    )


REL18_SQL = """
WITH spans AS (
  SELECT user_id, event_id, ts AS s,
         ts + (60 + event_id % 540) * INTERVAL 1 SECOND AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_chain,
         event_id
  FROM spans
),
chains AS (
  SELECT user_id, s, e,
         sum(new_chain) OVER (PARTITION BY user_id ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS chain
  FROM flagged
)
SELECT user_id, min(s) AS merge_start, max(e) AS merge_end,
       count(*) AS n_intervals
FROM chains
GROUP BY user_id, chain
ORDER BY user_id, merge_start
"""


# ---------------------------------------------------------------------------
# x14 — per-key integer EWMA (grouped-map recurrence)
# ---------------------------------------------------------------------------


def x14_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user EWMA smoothing with alpha = 1/4
    (operators/timeseries.py ewma): the sequential-recurrence tier of the
    custom-operator policy — applyInPandas per user, integer state, DuckDB
    recursive-CTE oracle replaying the identical trajectory."""
    from bioeco_portal_etl_spark.operators.timeseries import ewma

    e = T(spark, sf, "events")
    return ewma(e, "user_id", "ts", "event_id", "value", alpha_shift=2).orderBy(
        "user_id", "event_id"
    )


X14_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CAST(floor(value * 10000) AS BIGINT) AS v_e4,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
state AS (
  SELECT user_id, event_id, rn, v_e4 AS s FROM seq WHERE rn = 1
  UNION ALL
  -- floor division, explicitly: DuckDB's integer // TRUNCATES toward zero
  -- on negatives while the operator's Python // floors; /4.0 is exact in
  -- double for e4-scale deltas, so floor() reproduces Python exactly
  SELECT q.user_id, q.event_id, q.rn,
         st.s + CAST(floor((q.v_e4 - st.s) / 4.0) AS BIGINT)
  FROM state st JOIN seq q ON q.user_id = st.user_id AND q.rn = st.rn + 1
)
SELECT user_id, event_id, s AS ewma_e4
FROM state
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# mm4 — audio frame features through the Arrow media path
# ---------------------------------------------------------------------------


def mm4_audio_energy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-frame energy/peak over the binary payload treated as u8 PCM
    (multimodal/media.py audio_frame_features): mapInPandas frame
    windows, first 4 frames of 32 samples. The utf-8 payload is ASCII in
    the harness tables, so DuckDB recomputes the exact integers from code
    points without touching bytes."""
    from bioeco_portal_etl_spark.multimodal.media import (
        attach_payload,
        audio_frame_features,
    )

    d = T(spark, sf, "documents")
    media = attach_payload(d, "doc_id", "text")
    return audio_frame_features(media, frame_bytes=32, max_frames=4).orderBy(
        "media_id", "frame_idx"
    )


MM4_SQL = """
WITH f AS (
  SELECT doc_id AS media_id,
         unnest(range(0, least(4, (length(text) + 31) // 32))) AS frame_idx,
         text
  FROM documents
),
sub AS (
  SELECT media_id, frame_idx,
         list_transform(
           range(1, length(substr(text, CAST(frame_idx * 32 + 1 AS INT), 32)) + 1),
           j -> unicode(substr(substr(text, CAST(frame_idx * 32 + 1 AS INT), 32), CAST(j AS INT), 1)) - 64
         ) AS dev
  FROM f
)
SELECT media_id, frame_idx,
       len(dev) AS n_samples,
       CAST(list_sum(list_transform(dev, d -> d * d)) AS BIGINT) AS energy,
       list_max(list_transform(dev, d -> abs(d))) AS peak
FROM sub
ORDER BY media_id, frame_idx
"""


# ---------------------------------------------------------------------------
# rel19 — ordered funnel analysis
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["signup", "click", "purchase"]


def rel19_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user signup → click → purchase funnel (operators/funnel.py):
    ONE groupBy pass for any funnel length — per-step sorted time arrays
    + in-row cascade resolution — where the naive plan self-joins the
    clickstream once per step."""
    from bioeco_portal_etl_spark.operators.funnel import funnel_steps

    e = T(spark, sf, "events")
    return funnel_steps(e, "user_id", "ts", "event_type", _FUNNEL_STEPS).orderBy(
        "user"
    )


REL19_SQL = """
WITH g AS (
  SELECT user_id AS "user",
         list_sort(list_filter(list(CASE WHEN event_type = 'signup'
                                         THEN epoch_us(ts) END),
                   x -> x IS NOT NULL)) AS a0,
         list_sort(list_filter(list(CASE WHEN event_type = 'click'
                                         THEN epoch_us(ts) END),
                   x -> x IS NOT NULL)) AS a1,
         list_sort(list_filter(list(CASE WHEN event_type = 'purchase'
                                         THEN epoch_us(ts) END),
                   x -> x IS NOT NULL)) AS a2
  FROM events GROUP BY user_id
),
resolved AS (
  SELECT "user",
         a0[1] AS t_step1,
         list_filter(a1, x -> x > a0[1])[1] AS t_step2,
         list_filter(a2, x -> x > list_filter(a1, x -> x > a0[1])[1])[1] AS t_step3
  FROM g
)
SELECT "user",
       (t_step1 IS NOT NULL)::INT + (t_step2 IS NOT NULL)::INT
         + (t_step3 IS NOT NULL)::INT AS steps_completed,
       t_step1, t_step2, t_step3
FROM resolved
ORDER BY "user"
"""


# ---------------------------------------------------------------------------
# x15 — leakage-safe temporal split
# ---------------------------------------------------------------------------


def x15_temporal_split(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user last-20% temporal test split
    (operators/sampling.py temporal_split) — the forecasting/session-model
    eval split where random assignment would leak future context."""
    from bioeco_portal_etl_spark.operators.sampling import temporal_split

    e = T(spark, sf, "events").select("event_id", "user_id", "ts")
    return (
        temporal_split(e, "user_id", "ts", "event_id", test_pct=20)
        .select("event_id", "user_id", "split")
        .orderBy("event_id")
    )


X15_SQL = """
WITH ranked AS (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn_end,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT event_id, user_id,
       CASE WHEN rn_end <= (n * 20) // 100 THEN 'test' ELSE 'train' END AS split
FROM ranked
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# tx13 — bigram LM fluency scoring
# ---------------------------------------------------------------------------


def tx13_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-trained bigram-LM scores per document (text/lm.py
    bigram_lm_scores) — the transition-level fluency gate above tx11's
    unigram model."""
    from bioeco_portal_etl_spark.text.lm import bigram_lm_scores

    d = T(spark, sf, "documents")
    return bigram_lm_scores(d, "doc_id", "text").orderBy("doc_id")


def _tx13_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH tk AS (
  SELECT doc_id, {duck_tokens("text")} AS t FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM tk WHERE len(t) >= 2
),
v AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM big GROUP BY w1, w2),
lp AS (
  SELECT w1, w2,
         floor(ln(c12::DOUBLE / (sum(c12) OVER ())::DOUBLE)
               * 10000)::BIGINT AS lp_e4
  FROM v
),
d AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(lp_e4)::BIGINT AS sum_lp_e4
  FROM big JOIN lp USING (w1, w2) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_lp_e4,
       floor(sum_lp_e4::DOUBLE / n_bigrams::DOUBLE)::BIGINT AS avg_lp_e4
FROM d ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# gr3 — bounded-hop BFS reach
# ---------------------------------------------------------------------------

_CHAIN_EDGES_SQL = """
SELECT a.l_suppkey AS src, b.l_suppkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
 AND a.l_suppkey <> b.l_suppkey
UNION ALL
SELECT b.l_suppkey AS src, a.l_suppkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
 AND a.l_suppkey <> b.l_suppkey
"""


def _chain_supplier_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-line supplier pairs of every order, BOTH directions —
    the exact multiset the lineitem⋈lineitem self-join on
    (l_orderkey, l_linenumber + 1, differing suppliers) produces, built
    WITHOUT the join (round-12, guide §2.4): ONE groupBy(l_orderkey)
    collects the ~4-row (linenumber, suppkey) arrays (map-side partials,
    a single exchange of the skinny projection) and the pairs fold out
    in codegen as a per-row cross match over ln+1 — NOT adjacent-position
    pairing, so the multiset is exact even where (l_orderkey,
    l_linenumber) repeats or gaps (the synthetic testdata does both),
    and orders are a handful of lines so the in-row O(n²) is constant
    work. The self-join form paid two scans plus a sort-merge join (two
    exchanges + two sorts of the fact table) for the same rows. The
    DuckDB oracles still run the join form, so tri-SF validation
    re-proves the equivalence on the actual data. Shared by
    gr3/gr11/gr12/gr13/gr14/gr15/gr16."""
    li = T(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    arr = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_suppkey").alias("sk"),
            )
        ).alias("ls")
    )
    fwd = arr.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ls"),
                    lambda x: F.transform(
                        F.filter(
                            F.col("ls"),
                            lambda y: (y["ln"] == x["ln"] + 1)
                            & (y["sk"] != x["sk"]),
                        ),
                        lambda y: F.struct(
                            x["sk"].alias("src"), y["sk"].alias("dst")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def gr3_khop_reach(spark: SparkSession, sf: str) -> DataFrame:
    """3-hop minimum-distance reach from flagged suppliers (s_suppkey %
    17 == 0) over the ADJACENT-line supplier chain graph (sparser than
    gr1/gr2's full co-order clique, so distances are non-trivial) —
    graph/bfs.py khop_reach, bounded min-label propagation."""
    from bioeco_portal_etl_spark.graph.bfs import khop_reach

    edges = _chain_supplier_edges(spark, sf)
    seeds = (
        T(spark, sf, "supplier")
        .filter(F.col("s_suppkey") % 17 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return khop_reach(edges, seeds, k=3).orderBy("dist", "node")


def _gr3_sql() -> str:
    from bioeco_portal_etl_spark.graph.bfs import duck_khop

    return f"""
WITH RECURSIVE {duck_khop(
        _CHAIN_EDGES_SQL,
        "SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 17 = 0",
        3,
    )}
SELECT node, dist FROM reach ORDER BY dist, node
"""


# ---------------------------------------------------------------------------
# rel20 — rolling distinct count over a trailing window
# ---------------------------------------------------------------------------


def rel20_rolling_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct event types in each user's trailing 10 events — the
    windowed-cardinality telemetry signal (behavioral diversity). Window
    frames can't host COUNT(DISTINCT) in either engine; both sides use
    the list-collect + distinct-size formulation over the identical
    frame. One exchange + one sort."""
    from pyspark.sql import Window

    e = T(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.size(
                F.array_distinct(F.collect_list("event_type").over(w))
            ).alias("n_distinct_types"),
        )
        .orderBy("event_id")
    )


REL20_SQL = """
SELECT event_id, user_id,
       len(list_distinct(list(event_type) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS n_distinct_types
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# tx14 — readability scoring
# ---------------------------------------------------------------------------


def tx14_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch-style readability per document from regex counts alone:
    words (alnum token runs), sentences ([.!?] runs, min 1), syllables
    (vowel-group runs, the standard approximation). The score is the
    literal expression 206.835 - 1.015*(W/S) - 84.6*(Y/W) evaluated in
    the SAME operation order on both engines (IEEE +-*/ only), then
    FLOOR-quantized e2 — floor, not round(2): the engines' round()
    implementations disagree on half-boundary doubles (85.165). Pure
    scan-stage column algebra — the cheapest quality signal in the text
    gate family."""
    d = T(spark, sf, "documents")
    wc = F.size(F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""))
    sc = F.greatest(F.lit(1), F.regexp_count(F.col("text"), F.lit("[.!?]+")))
    yc = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
    flesch_e2 = F.floor(
        (
            F.lit(206.835)
            - F.lit(1.015) * (wc / sc)
            - F.lit(84.6) * (yc / wc)
        )
        * 100
    ).cast("long")
    return (
        d.select(
            "doc_id",
            wc.alias("n_words"),
            sc.alias("n_sentences"),
            yc.alias("n_syllables"),
            F.when(wc > 0, flesch_e2).alias("flesch_e2"),
        )
        .orderBy("doc_id")
    )


def _tx14_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH base AS (
  SELECT doc_id,
         len({duck_tokens("text")}) AS n_words,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         CAST(floor((206.835 - 1.015 * (n_words / n_sentences)
               - 84.6 * (n_syllables / n_words)) * 100) AS BIGINT)
       END AS flesch_e2
FROM base
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# w8 — streaming rolling z-score anomalies
# ---------------------------------------------------------------------------


def w8_streaming_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming anomaly gate (streaming/anomaly.py streaming_zscore):
    the streaming face of x13 — applyInPandasWithState ring buffer of the
    last 10 e2 values per user, availableNow drain. In-trigger iteration
    is (ts, event_id)-sorted, so a single-batch drain reproduces the
    batch operator exactly; the oracle is x13's SQL with the z surfaced
    as floor-e4 (the streaming face avoids round()'s half-boundary
    divergence entirely)."""
    import os

    from bioeco_portal_etl_spark.streaming.anomaly import (
        prepare_event_stream,
        streaming_zscore,
    )

    T(spark, sf, "events")  # pins UTC session tz for the epoch math
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            "value",
        )
    )
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    # state-store instance count = shuffle partitions; size to the
    # drain, scoped + restored (see scoped_shuffle_partitions)
    with scoped_shuffle_partitions(spark, 8):
        q = (
            streaming_zscore(prepare_event_stream(stream))
            .writeStream.format("memory")
            .queryName("w8_anomaly_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w8 stream did not drain")
    return (
        spark.table("w8_anomaly_mem")
        .select("event_id", "user_id", "value", "z_e4")
        .orderBy("event_id")
    )


W8_SQL = """
WITH q AS (
  SELECT event_id, user_id, value,
         CAST(floor(value * 100) AS BIGINT) AS v_e2,
         count(*) OVER w AS n,
         sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS s1,
         sum(CAST(floor(value * 100) AS BIGINT) * CAST(floor(value * 100) AS BIGINT)) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_id, user_id, value,
         CAST(floor((v_e2 - s1 / n) / sqrt((n * s2 - s1 * s1) / (n * n))
              * 10000) AS BIGINT) AS z_e4
  FROM q
  WHERE n >= 5 AND n * s2 - s1 * s1 > 0
)
SELECT event_id, user_id, value, z_e4
FROM z WHERE abs(z_e4) > 25000
ORDER BY event_id
"""


CATALOG_EXT2: dict = {
    "sk1_kmv_distinct": (sk1_kmv_distinct, _sk1_sql()),
    "sk2_cms_heavy_hitters": (sk2_cms_heavy_hitters, _sk2_sql()),
    "sk3_hll_distinct": (sk3_hll_distinct, _sk3_sql()),
    "sk4_bloom_gate": (sk4_bloom_gate, _sk4_sql()),
    "gr1_pagerank": (gr1_pagerank, _gr1_sql()),
    "gr2_triangles": (gr2_triangles, _gr2_sql()),
    "rel16_median_mad": (rel16_median_mad, REL16_SQL),
    "rel17_islands": (rel17_islands, REL17_SQL),
    "x12_weighted_sample": (x12_weighted_sample, _x12_sql()),
    "x13_rolling_zscore": (x13_rolling_zscore, X13_SQL),
    "tx12_vocab_growth": (tx12_vocab_growth, _tx12_sql()),
    "sk5_kmv_setops": (sk5_kmv_setops, _sk5_sql()),
    "rel18_interval_merge": (rel18_interval_merge, REL18_SQL),
    "x14_ewma": (x14_ewma, X14_SQL),
    "mm4_audio_energy": (mm4_audio_energy, MM4_SQL),
    "rel19_funnel": (rel19_funnel, REL19_SQL),
    "x15_temporal_split": (x15_temporal_split, X15_SQL),
    "tx13_bigram_lm": (tx13_bigram_lm, _tx13_sql()),
    "gr3_khop_reach": (gr3_khop_reach, _gr3_sql()),
    "rel20_rolling_distinct": (rel20_rolling_distinct, REL20_SQL),
    "tx14_readability": (tx14_readability, _tx14_sql()),
    "w8_streaming_anomaly": (w8_streaming_anomaly, W8_SQL),
}
