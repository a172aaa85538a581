"""Catalog extension 18 — round-5 fifteenth batch.

- gr14_harmonic_centrality: truncated harmonic centrality from the gr11
  HyperBall ball sizes (graph/hyperball.py harmonic_centrality) — the
  statistic HyperBall was built to compute, read off ball-size deltas
  with per-term floored integer division;
- rel32_window_funnel: ClickHouse-style timeout funnel
  (operators/funnel.py window_funnel) — max consecutive steps completed
  within a deadline of the chain's first step, maximal over ALL step-1
  starts, still one shuffle;
- x37_range_partition_audit: range-partitioner boundary estimation from
  a deterministic md5 sample + per-bucket balance audit
  (operators/rangepart.py) — the repartitionByRange sampling step as an
  inspectable, oracle-checkable operator;
- tx32_feature_hashing: the hashing trick with its collision audit
  (text/feature_hash.py) — fixed-width vocabulary-free TF vectors and
  the per-doc cost of choosing D, on the engine's md5 h60 so both faces
  are engine-exact;
- w19_stream_native_sessions: LIVE engine-managed sessionization via
  the built-in session_window (streaming/windows.py
  native_session_counts) — append-mode drains equal batch sessions
  restricted to session_end <= max(ts) - delay.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr14 — harmonic centrality from HyperBall
# ---------------------------------------------------------------------------


def gr14_harmonic_centrality(spark: SparkSession, sf: str) -> DataFrame:
    """Radius-2 harmonic centrality of every supplier over the chain
    graph: HyperBall ball sizes -> per-term floored deltas/r. Nodes
    with empty radius-2 neighborhoods report 0."""
    from bioeco_portal_etl_spark.graph.hyperball import (
        harmonic_centrality,
        hyperball_neighborhood,
    )

    from bioeco_portal_etl_spark.catalog_ext2 import _chain_supplier_edges

    edges = _chain_supplier_edges(spark, sf)
    nodes = T(spark, sf, "supplier").select(F.col("s_suppkey").alias("node"))
    hb = hyperball_neighborhood(edges, nodes, radius=2)
    return harmonic_centrality(hb, radius=2).orderBy("node")


def _gr14_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext2 import _CHAIN_EDGES_SQL
    from bioeco_portal_etl_spark.graph.hyperball import duck_hyperball

    return f"""
WITH {duck_hyperball(
        _CHAIN_EDGES_SQL,
        "SELECT s_suppkey AS node FROM supplier",
        2,
    )},
piv AS (
  SELECT node,
         max(CASE WHEN r = 0 THEN ball_est END) AS b0,
         max(CASE WHEN r = 1 THEN ball_est END) AS b1,
         max(CASE WHEN r = 2 THEN ball_est END) AS b2
  FROM hb GROUP BY node
)
SELECT node,
       CAST(((b1 - b0) * 1000000) // 1 + ((b2 - b1) * 1000000) // 2
            AS BIGINT) AS harmonic_e6
FROM piv ORDER BY node"""


# ---------------------------------------------------------------------------
# rel32 — timeout funnel
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour


def rel32_window_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """view -> click -> purchase within 1 hour of the chain's first
    view, level maximal over every view the user fired; reported as the
    per-level user census (operators/funnel.py window_funnel)."""
    from bioeco_portal_etl_spark.operators.funnel import window_funnel

    ev = T(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    lv = window_funnel(
        ev, "user_id", "ts", "event_type", _FUNNEL_STEPS, _FUNNEL_WINDOW_US
    )
    return (
        lv.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("funnel_level")
    )


def _rel32_sql() -> str:
    w = _FUNNEL_WINDOW_US
    steps = _FUNNEL_STEPS
    arrays = ",\n         ".join(
        f"list_sort(coalesce(list(epoch_us(ts))"
        f" FILTER (WHERE event_type = '{s}'), [])) AS a{i}"
        for i, s in enumerate(steps)
    )
    return f"""
WITH g AS (
  SELECT user_id,
         {arrays}
  FROM events GROUP BY user_id
),
lv AS (
  SELECT user_id,
         CASE WHEN len(a0) = 0 THEN 0 ELSE list_max(
           list_transform(a0, t1 -> (
             CASE WHEN len(list_filter(a2, x -> x >
                    coalesce(list_filter(a1, y -> y > t1
                                              AND y <= t1 + {w})[1], 9223372036854775807)
                    AND x <= t1 + {w})) > 0
                  THEN 3
                  WHEN len(list_filter(a1, y -> y > t1 AND y <= t1 + {w})) > 0
                  THEN 2
                  ELSE 1 END)))
         END AS funnel_level
  FROM g
)
SELECT funnel_level, count(*)::BIGINT AS n_users
FROM lv GROUP BY funnel_level ORDER BY funnel_level"""


# ---------------------------------------------------------------------------
# x37 — range-partitioner boundaries + balance audit
# ---------------------------------------------------------------------------

_RP_BUCKETS, _RP_PERMILLE = 8, 50


def x37_range_partition_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Estimate 7 split points of o_custkey from the deterministic 5%
    md5 sample of orders, then audit the full table's per-bucket row
    counts and value spans (operators/rangepart.py) — the
    repartitionByRange sampling pass, checkable end to end."""
    from bioeco_portal_etl_spark.operators.rangepart import (
        range_assignment_audit,
        range_boundaries,
    )

    o = T(spark, sf, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("long").alias("o_custkey")
    )
    b = range_boundaries(
        o, "o_custkey", "o_orderkey", _RP_BUCKETS, _RP_PERMILLE
    )
    return (
        range_assignment_audit(o, "o_custkey", b)
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("min_v").cast("long").alias("min_v"),
            F.col("max_v").cast("long").alias("max_v"),
        )
        .orderBy("bucket")
    )


def _x37_sql() -> str:
    from bioeco_portal_etl_spark.sketches import duck_h60

    h = duck_h60("CAST(o_orderkey AS VARCHAR)")
    b, p = _RP_BUCKETS, _RP_PERMILLE
    picks = ",\n         ".join(
        f"min(CASE WHEN {b} * cum - {j} * n >= 0 THEN v END) AS b{j}"
        for j in range(1, b)
    )
    bounds = " UNION ALL ".join(
        f"SELECT b{j} AS boundary FROM wide" for j in range(1, b)
    )
    return f"""
WITH src AS (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS v FROM orders
),
sampled AS (SELECT v FROM src WHERE ({h}) % 1000 < {p}),
freq AS (SELECT v, count(*) AS c FROM sampled GROUP BY v),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM freq
),
wide AS (SELECT {picks} FROM cum),
bounds AS ({bounds}),
counts AS (SELECT v, count(*) AS n_rows_v FROM src GROUP BY v),
per_value AS (
  SELECT c.v, max(c.n_rows_v) AS n_rows_v,
         sum(CASE WHEN c.v >= b.boundary THEN 1 ELSE 0 END) AS bucket
  FROM counts c CROSS JOIN bounds b GROUP BY c.v
)
SELECT bucket::BIGINT AS bucket, sum(n_rows_v)::BIGINT AS n_rows,
       min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v
FROM per_value GROUP BY bucket ORDER BY bucket"""


# ---------------------------------------------------------------------------
# tx32 — feature hashing collision audit
# ---------------------------------------------------------------------------

_FH_DIM = 64


def tx32_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick featurization audit at D = 64 for doc_id < 300:
    per-doc token/term/bucket counts and the e6 collision share —
    the number that picks D (text/feature_hash.py)."""
    from bioeco_portal_etl_spark.text.feature_hash import collision_audit

    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return collision_audit(d, "doc_id", "text", dim=_FH_DIM).orderBy(
        "doc_id"
    )


def _tx32_sql() -> str:
    from bioeco_portal_etl_spark.text.feature_hash import duck_hashed_features

    body = duck_hashed_features(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300",
        dim=_FH_DIM,
    )
    return f"""
WITH {body}
SELECT doc_id, n_tokens, n_terms, n_buckets, collision_e6
FROM hf_audit ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# w19 — LIVE native session_window sessionization
# ---------------------------------------------------------------------------


def w19_stream_native_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Engine-managed streaming sessions (30 min gap) drained
    availableNow in append mode: a session emits once the 2 h watermark
    proves it closed, so the result equals batch session_window
    restricted to session_end <= max(ts) - 2h (exactly what the oracle
    computes, with the builtin's strict-< merge boundary)."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.windows import (
        native_session_counts,
    )

    T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
        .withWatermark("ts", "2 hours")
    )
    res = native_session_counts(stream, "30 minutes", "user_id")
    with scoped_shuffle_partitions(spark, 8):
        q = (
            res.writeStream.format("memory")
            .queryName("w19_sess_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w19 stream did not drain")
    return spark.table("w19_sess_mem").orderBy(
        "session_start", "user_id"
    )


W19_SQL = """
WITH mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events),
x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
y AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
s AS (
  SELECT min(ts) AS session_start,
         max(ts) + INTERVAL '30 minutes' AS session_end,
         user_id, count(*)::BIGINT AS n_events
  FROM y GROUP BY user_id, sid
)
SELECT session_start, session_end, user_id, n_events
FROM s, mx WHERE session_end <= wm
ORDER BY session_start, user_id"""


CATALOG_EXT18 = {
    "gr14_harmonic_centrality": (gr14_harmonic_centrality, _gr14_sql()),
    "rel32_window_funnel": (rel32_window_funnel, _rel32_sql()),
    "x37_range_partition_audit": (x37_range_partition_audit, _x37_sql()),
    "tx32_feature_hashing": (tx32_feature_hashing, _tx32_sql()),
    "w19_stream_native_sessions": (w19_stream_native_sessions, W19_SQL),
}
