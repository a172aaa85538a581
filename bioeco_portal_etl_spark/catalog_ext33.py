"""Round-7 third batch — 4 oracle-checked entries:

- w21_stream_locf_segments: streaming LOCF segmentation
  (streaming/locf.py, applyInPandasWithState) — the stateful face of
  rel38's time-weighted average: one emitted row per CLOSED
  value-holding segment, O(users) state; at any drain point the output
  equals the batch lead()-segments minus each user's open tail, which is
  exactly what the oracle computes;
- x51_exact_quantiles: EXACT p50/p95/p99 without a global sort — the
  two-phase plan (bucket histogram -> locate the target bucket ->
  per-value scan of ONE bucket) that replaces the documented
  "global-sort posture" with a real implementation: both passes are
  combinable aggregates, and the driver only ever sees the bounded
  bucket histogram;
- gr23_degree_inequality: Lorenz/Gini COEFFICIENT of the customer order-
  count distribution plus the top-1% degree share — the one-number
  centralization diagnostic that decides salting strategy (distinct from
  gr4's histogram shape and from mm16's Gini IMPURITY, which is 1-Σp²);
- dq17_freshness_lag: per-event-type staleness — last event time vs the
  corpus high-water mark — the ingestion-freshness SLA audit (dq8
  measures per-EVENT lateness against a watermark; this measures
  per-STREAM dormancy).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# w21 — streaming LOCF segments
# ---------------------------------------------------------------------------


def w21_stream_locf_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (streaming/locf.py): LOCF
    segmentation via applyInPandasWithState, drained availableNow into a
    memory sink. Emits every CLOSED segment; each user's final
    observation stays open in state — so the drained output is the batch
    lead()-segment table minus each user's last row, deterministic at
    any drain point."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.locf import streaming_locf_segments

    T(spark, sf, "events")  # pins UTC session tz for the epoch math
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .filter(F.col("user_id") < 80)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            F.floor(F.col("value") * 10000.0).cast("long").alias("vq"),
        )
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            streaming_locf_segments(stream)
            .writeStream.format("memory")
            .queryName("w21_locf_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover - drain must finish within timeout
            raise RuntimeError("w21 stream did not drain")
    return spark.table("w21_locf_mem").orderBy(
        "user_id", "start_us", "dur_us", "vq"
    )


_W21_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         floor(value * 10000.0)::BIGINT AS vq
  FROM events WHERE user_id < 80
),
led AS (
  SELECT user_id, ts_us, vq,
         lead(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) AS next_us
  FROM e
)
SELECT user_id, ts_us AS start_us, (next_us - ts_us)::BIGINT AS dur_us, vq
FROM led WHERE next_us IS NOT NULL
ORDER BY user_id, start_us, dur_us, vq"""


# ---------------------------------------------------------------------------
# x51 — exact quantiles, two-phase (no global sort)
# ---------------------------------------------------------------------------

_X51_PS = (50, 95, 99)
_X51_BUCKET = 100_000  # cents -> $1000 buckets


def x51_exact_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT order statistics at p50/p95/p99 of the order value without
    ever sorting the full table: phase 1 aggregates a bounded bucket
    histogram (value domain / bucket width rows — the only thing the
    driver sees); the driver locates each quantile's bucket and in-bucket
    offset; phase 2 scans ONLY the target buckets and resolves the exact
    value with a per-bucket cumulative count. Rank convention:
    k_p = (n-1)*p//100, zero-based — mirrored literally in the oracle's
    correlated subquery. This is the runnable form of the 'two-pass
    range-partitioned prefix sum' posture the global-sort entries
    (x47 decile lift, x50 KS) document for 100 TB."""
    return exact_quantiles_frame(
        T(spark, sf, "orders").select(
            F.floor(F.col("o_totalprice").cast("double") * 100.0)
            .cast("long")
            .alias("v")
        )
    )


def exact_quantiles_frame(values: DataFrame) -> DataFrame:
    spark = values.sparkSession
    b = values.select(
        "v", F.floor(F.col("v") / _X51_BUCKET).cast("long").alias("bkt")
    )
    # bounded driver fetch: one row per occupied $1000 bucket
    hist = sorted(
        (r.bkt, r.c)
        for r in b.groupBy("bkt").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in hist)
    targets = []
    for p in _X51_PS:
        k = (n - 1) * p // 100
        cum = 0
        for bkt, c in hist:
            if cum + c > k:
                targets.append((p, bkt, k - cum))
                break
            cum += c
    tgt = spark.createDataFrame(targets, "p long, bkt long, off long")
    per_value = (
        b.join(F.broadcast(tgt), "bkt")
        .groupBy("p", "off", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("p").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    picked = (
        per_value.withColumn("cum", F.sum("c").over(w))
        .filter(F.col("cum") > F.col("off"))
        .groupBy("p")
        .agg(F.min("v").alias("value_cents"))
    )
    return picked.select(
        "p", F.lit(n).cast("long").alias("n"), "value_cents"
    ).orderBy("p")


_X51_SQL = f"""
WITH v AS (
  SELECT floor(CAST(o_totalprice AS DOUBLE) * 100.0)::BIGINT AS v
  FROM orders
),
n AS (SELECT count(*)::BIGINT AS n FROM v),
pv AS (SELECT v, count(*)::BIGINT AS c FROM v GROUP BY v),
cum AS (
  SELECT v,
         sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
  FROM pv
),
ps AS (SELECT unnest([{", ".join(str(p) for p in _X51_PS)}]) AS p)
SELECT p::BIGINT AS p, n.n,
       (SELECT min(v) FROM cum WHERE cum > (n.n - 1) * p // 100)
         AS value_cents
FROM ps CROSS JOIN n
ORDER BY p"""


# ---------------------------------------------------------------------------
# gr23 — degree inequality (Lorenz/Gini coefficient + top share)
# ---------------------------------------------------------------------------


def gr23_degree_inequality(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of the customer order-count distribution and the
    top-1% share — how centralized is the activity graph? (Decides skew
    strategy: G near 0 means uniform keys, G near 1 means salt the
    hubs.) Discrete Lorenz form G = 2·Σ(i·d_i)/(n·Σd) - (n+1)/n over
    ascending-sorted degrees, all-integer sums, ranks from one bounded
    window over the NODE table (vertex-scaled, not edge-scaled)."""
    deg = (
        T(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return degree_inequality_frame(deg)


def degree_inequality_frame(deg: DataFrame) -> DataFrame:
    """Frame-level body of gr23 over a (node, deg) table."""
    w_all = Window.partitionBy(F.lit(1))
    ranked = deg.select(
        "deg",
        F.row_number()
        .over(Window.orderBy(F.asc("deg"), F.asc("node")))
        .cast("long")
        .alias("i"),
        F.row_number()
        .over(Window.orderBy(F.desc("deg"), F.desc("node")))
        .cast("long")
        .alias("j"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("nn"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("deg").alias("sd"),
        F.sum(F.col("i") * F.col("deg")).alias("si"),
        F.sum(
            F.when(
                # floor(), never a bare cast: DuckDB CAST(1.5 AS BIGINT)
                # ROUNDS to 2 while Spark truncates to 1 (PORTABILITY.md) —
                # this fired at sf0.001 where n=150 makes n/100 = 1.5
                F.col("j")
                <= F.greatest(
                    F.lit(1).cast("long"),
                    F.floor(F.col("nn") / 100).cast("long"),
                ),
                F.col("deg"),
            ).otherwise(F.lit(0))
        ).alias("top_sum"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_nodes"),
        F.col("sd").cast("long").alias("total_degree"),
        F.floor(
            (
                F.lit(2.0)
                * F.col("si").cast("double")
                / (nd * F.col("sd").cast("double"))
                - (nd + 1.0) / nd
            )
            * 1000000.0
        )
        .cast("long")
        .alias("gini_e6"),
        F.floor(
            F.col("top_sum").cast("double")
            * 1000000.0
            / F.col("sd").cast("double")
        )
        .cast("long")
        .alias("top1pct_share_e6"),
    )


_GR23_SQL = """
WITH deg AS (
  SELECT o_custkey AS node, count(*)::BIGINT AS deg
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT deg,
         row_number() OVER (ORDER BY deg ASC, node ASC)::BIGINT AS i,
         row_number() OVER (ORDER BY deg DESC, node DESC)::BIGINT AS j,
         count(*) OVER ()::BIGINT AS nn
  FROM deg
),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(deg)::BIGINT AS sd,
         sum(i * deg)::BIGINT AS si,
         sum(CASE WHEN j <= greatest(1, floor(nn / 100)::BIGINT)
                  THEN deg ELSE 0 END)::BIGINT AS top_sum
  FROM ranked
)
SELECT n AS n_nodes, sd AS total_degree,
       floor((2.0 * CAST(si AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sd AS DOUBLE))
              - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
             * 1000000.0)::BIGINT AS gini_e6,
       floor(CAST(top_sum AS DOUBLE) * 1000000.0
             / CAST(sd AS DOUBLE))::BIGINT AS top1pct_share_e6
FROM agg"""


# ---------------------------------------------------------------------------
# dq17 — freshness lag
# ---------------------------------------------------------------------------

_DQ17_STALE_US = 43_200_000_000  # 12 h


def dq17_freshness_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type dormancy: the last observed event time against the
    corpus high-water mark, with a 12-hour staleness flag — the
    ingestion-freshness SLA board (a silent dead producer shows up here
    long before any value-level check fires). One combinable aggregate
    per type plus a 1-row broadcast of the global maximum."""
    e = T(spark, sf, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
    )
    per_type = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts_us").alias("last_us"),
    )
    hwm = e.agg(F.max("ts_us").alias("hwm_us"))
    return (
        per_type.crossJoin(F.broadcast(hwm))
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("last_us").cast("long").alias("last_us"),
            (F.col("hwm_us") - F.col("last_us")).cast("long").alias("lag_us"),
            F.when(
                F.col("hwm_us") - F.col("last_us") > _DQ17_STALE_US, 1
            )
            .otherwise(0)
            .cast("long")
            .alias("is_stale"),
        )
        .orderBy("event_type")
    )


_DQ17_SQL = f"""
WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
per_type AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         max(ts_us)::BIGINT AS last_us
  FROM e GROUP BY event_type
),
hwm AS (SELECT max(ts_us)::BIGINT AS hwm_us FROM e)
SELECT event_type, n_events, last_us,
       (hwm_us - last_us)::BIGINT AS lag_us,
       CASE WHEN hwm_us - last_us > {_DQ17_STALE_US} THEN 1 ELSE 0 END::BIGINT
         AS is_stale
FROM per_type CROSS JOIN hwm
ORDER BY event_type"""


CATALOG_EXT33 = {
    "w21_stream_locf_segments": (w21_stream_locf_segments, _W21_SQL),
    "x51_exact_quantiles": (x51_exact_quantiles, _X51_SQL),
    "gr23_degree_inequality": (gr23_degree_inequality, _GR23_SQL),
    "dq17_freshness_lag": (dq17_freshness_lag, _DQ17_SQL),
}
