"""Round-5 catalog extensions, sixth batch — 6 entries:

- w13_stream_two_level_agg: LIVE chained streaming aggregation
  (window-over-window, the Spark 3.4+ multiple-stateful-operator path):
  15-minute tumbling counts re-aggregated into hourly rollups inside ONE
  streaming query, drained append-mode — the pre-agg→rollup cascade
  every metrics pipeline runs;
- td12_lsh_quality: evaluation harness for the MinHash-LSH candidate
  generator — candidate recall/precision against the EXACT shingle-
  Jaccard ground truth (blocked, complete for jaccard > 0): the "pair
  every approximate operator with its exact twin" policy as a first-
  class catalog entry;
- x27_epoch_shuffle: deterministic training-epoch shuffle (operators/
  sampling.py epoch_shuffle) — md5(seed:id) keys, shard assignment,
  within-shard order + per-shard audit (count/first/last/checksum);
- x28_compaction_plan: lakehouse small-file compaction planning
  (operators/compaction.py) — next-fit-decreasing bin packing as a pure
  left fold, identical fold algebra on both engines;
- tx25_blocklist_filter: category blocklist hits + keep verdict
  (text/blocklist.py) — the wordlist safety/policy stage next to tx6;
- rel27_rolling_slope: rolling OLS trend per key (operators/
  timeseries.py rolling_slope) — integer sufficient statistics in one
  window frame, single floored division.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs over the
driver's synthetic tables, aliased identically on both sides, ending in
a deterministic ORDER BY; integer surfaces BIGINT-cast per
PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# w13 — chained streaming aggregation (window over window)
# ---------------------------------------------------------------------------


def w13_stream_two_level_agg(spark: SparkSession, sf: str) -> DataFrame:
    """15-min tumbling counts cascaded into hourly rollups in one LIVE
    streaming query (two stateful aggregations; watermark propagates
    through the first into the second). Drained with availableNow in
    append mode: only hours finalized by the watermark emit, so the
    result equals the batch rollup restricted to hour_end <= max(ts) -
    2 h — exactly what the oracle computes. n_subwindows counts the
    15-min windows WITH data inside each hour (the pre-agg fan-in)."""
    import os

    T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .withWatermark("ts", "2 hours")
    )
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    lvl1 = stream.groupBy(
        F.window("ts", "15 minutes").alias("w15"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n15"))
    lvl2 = (
        lvl1.groupBy(
            F.window(F.col("w15"), "1 hour").alias("wh"), "event_type"
        )
        .agg(
            F.sum("n15").alias("n_events"),
            F.count(F.lit(1)).alias("n_subwindows"),
        )
        .select(
            F.col("wh.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_subwindows",
        )
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            lvl2.writeStream.format("memory")
            .queryName("w13_twolevel_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w13 stream did not drain")
    return spark.table("w13_twolevel_mem").orderBy("hour_start", "event_type")


W13_SQL = """
WITH mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events),
b15 AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w15, event_type,
         count(*)::BIGINT AS n15
  FROM events GROUP BY 1, 2
)
SELECT time_bucket(INTERVAL '1 hour', w15) AS hour_start, event_type,
       sum(n15)::BIGINT AS n_events, count(*)::BIGINT AS n_subwindows
FROM b15 CROSS JOIN mx
WHERE time_bucket(INTERVAL '1 hour', w15) + INTERVAL '1 hour'
      <= (SELECT wm FROM mx)
GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# td12 — LSH candidate quality vs exact-Jaccard ground truth
# ---------------------------------------------------------------------------

_TD12_THRESH = "0.5"


def td12_lsh_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Recall/precision of the td2 MinHash-LSH candidate generator
    against the complete exact ground truth: all pairs with 3-shingle
    Jaccard >= 0.5 (blocked by shared shingle — complete for any
    jaccard > 0, so no true pair can hide). One row:
    (n_candidates, n_true, tp, recall_e4, precision_e4). The hash gate
    makes the approximate operator's QUALITY a regression-tested number,
    not a hope."""
    from bioeco_portal_etl_spark.text.dedupe import (
        minhash_lsh_pairs,
        shingled,
    )

    d = T(spark, sf, "documents")
    sh = shingled(d, "doc_id", "text", 3).persist()
    try:
        cand = minhash_lsh_pairs(d, "doc_id", "text", shingles=sh)
        # Round-12 (guide §2.3): the shingle arrays are SETS
        # (text/tokenize.shingles is array_distinct), so |A∩B| is exactly
        # the count of shared shingles in the blocked self-join and
        # |A∪B| = |A| + |B| - |A∩B| — one combinable pair count replaces
        # the previous distinct-pairs exchange plus two array-attaching
        # joins plus per-pair array_intersect/array_union scans. The
        # threshold test is the identical int/int double division.
        exg = sh.select(
            "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")
        )
        a, b = exg.alias("a"), exg.alias("b")
        gt = (
            a.join(b, "s")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("id_a"),
                F.col("a.n").alias("n_a"),
                F.col("b.doc_id").alias("id_b"),
                F.col("b.n").alias("n_b"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(
                F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c"))
                >= float(_TD12_THRESH)
            )
            .select("id_a", "id_b")
        )
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        n_true = gt.agg(F.count(F.lit(1)).alias("n_true"))
        tp = cand.join(gt, ["id_a", "id_b"]).agg(
            F.count(F.lit(1)).alias("tp")
        )
        out = (
            n_cand.crossJoin(n_true)
            .crossJoin(tp)
            .select(
                "n_candidates",
                "n_true",
                "tp",
                F.expr("(10000 * tp) div n_true").alias("recall_e4"),
                F.expr("(10000 * tp) div n_candidates").alias(
                    "precision_e4"
                ),
            )
        )
        # single-row result: materialize before unpersisting the stage
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        sh.unpersist()


def _td12_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_SH

    return f"""
WITH {_DUCK_SH},
gt_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
),
gt AS (
  SELECT g.id_a, g.id_b
  FROM gt_cand g
  JOIN sh a ON a.doc_id = g.id_a
  JOIN sh b ON b.doc_id = g.id_b
  WHERE len(list_intersect(a.sg, b.sg))
        / len(list_distinct(a.sg || b.sg)) >= {_TD12_THRESH}
),
m AS (
  SELECT (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
         (SELECT count(*) FROM gt)::BIGINT AS n_true,
         (SELECT count(*) FROM cand c
            JOIN gt g ON c.id_a = g.id_a AND c.id_b = g.id_b)::BIGINT AS tp
)
SELECT n_candidates, n_true, tp,
       ((10000 * tp) // n_true)::BIGINT AS recall_e4,
       ((10000 * tp) // n_candidates)::BIGINT AS precision_e4
FROM m"""


# ---------------------------------------------------------------------------
# x27 — deterministic epoch shuffle + audit
# ---------------------------------------------------------------------------

_X27_SEED = "epoch-0"
_X27_SHARDS = 16


def x27_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Audit of the seed-{s} epoch shuffle of the documents corpus into
    {n} shards (operators/sampling.py epoch_shuffle): per shard, row
    count, the first/last doc ids in shuffle order and the id checksum —
    the reproducibility proof a training run logs per epoch."""
    from bioeco_portal_etl_spark.operators.sampling import (
        epoch_shuffle,
        epoch_shuffle_audit,
    )

    d = T(spark, sf, "documents").select("doc_id")
    return epoch_shuffle_audit(
        epoch_shuffle(d, "doc_id", _X27_SEED, n_shards=_X27_SHARDS), "doc_id"
    ).orderBy("shard")


x27_epoch_shuffle.__doc__ = x27_epoch_shuffle.__doc__.format(
    s=_X27_SEED, n=_X27_SHARDS
)


def _x27_sql() -> str:
    from bioeco_portal_etl_spark.sketches import duck_h60

    h = duck_h60(f"'{_X27_SEED}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH keyed AS (
  SELECT doc_id, {h} AS k FROM documents
),
sharded AS (SELECT doc_id, k, k % {_X27_SHARDS} AS shard FROM keyed)
SELECT shard, count(*)::BIGINT AS n_rows,
       min_by(doc_id, k) AS first_id,
       max_by(doc_id, k) AS last_id,
       sum(doc_id)::BIGINT AS id_sum
FROM sharded GROUP BY shard ORDER BY shard"""


# ---------------------------------------------------------------------------
# x28 — compaction planning over a synthetic file listing
# ---------------------------------------------------------------------------

_X28_TARGET = 128


def x28_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Next-fit-decreasing compaction plan per brand over a synthetic
    per-part file listing (file size = (p_partkey * 7) % 100 + 1 MB):
    how many {t}-MB output files a rewrite produces and how full the
    last one is (operators/compaction.py — pure left-fold bin packing,
    engine-exact)."""
    from bioeco_portal_etl_spark.operators.compaction import compaction_plan

    files = T(spark, sf, "part").select(
        F.col("p_brand"),
        F.col("p_partkey").alias("file_id"),
        ((F.col("p_partkey") * 7) % 100 + 1).cast("long").alias("size_mb"),
    )
    return compaction_plan(
        files, "p_brand", "file_id", "size_mb", target_size=_X28_TARGET
    ).orderBy("p_brand")


x28_compaction_plan.__doc__ = x28_compaction_plan.__doc__.format(
    t=_X28_TARGET
)


def _x28_sql() -> str:
    from bioeco_portal_etl_spark.operators.compaction import (
        duck_compaction_cte,
    )

    files = (
        "SELECT p_brand, p_partkey AS file_id,"
        " ((p_partkey * 7) % 100 + 1)::BIGINT AS size_mb FROM part"
    )
    return f"""
WITH {duck_compaction_cte(files, "p_brand", "file_id", "size_mb", _X28_TARGET)}
SELECT p_brand, n_files, total_size, n_bins, last_bin_load
FROM comp ORDER BY p_brand"""


# ---------------------------------------------------------------------------
# tx25 — category blocklist filter
# ---------------------------------------------------------------------------

_TX25_CATS = {
    "infra": ["spark", "hash", "shard"],
    "ops": ["merge", "sort"],
}
_TX25_MAX = 2


def tx25_blocklist_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Category blocklist hits + keep verdict for the first 300 docs
    (text/blocklist.py): exact-token matches against two term lists,
    keep iff every category stays within {m} hits — the wordlist policy
    filter next to tx6's PII redaction."""
    from bioeco_portal_etl_spark.text.blocklist import blocklist_hits

    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return blocklist_hits(
        d, "doc_id", "text", _TX25_CATS, max_hits=_TX25_MAX
    ).orderBy("doc_id")


tx25_blocklist_filter.__doc__ = tx25_blocklist_filter.__doc__.format(
    m=_TX25_MAX
)


def _tx25_sql() -> str:
    from bioeco_portal_etl_spark.text.blocklist import duck_blocklist_sql
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    ctes = duck_blocklist_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 300)",
        "doc_id",
        duck_tokens("text"),
        _TX25_CATS,
        max_hits=_TX25_MAX,
    )
    return f"""
WITH {ctes.lstrip()}
SELECT doc_id, n_tokens, hits_infra, hits_ops, keep
FROM verdicts ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# rel27 — rolling OLS slope
# ---------------------------------------------------------------------------


def rel27_rolling_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 10-row OLS trend of event value per event type over the
    user_id<20 slice (operators/timeseries.py rolling_slope): integer
    sufficient statistics in one window frame, the single division
    floored at e6 — the is-this-metric-trending statistic."""
    from bioeco_portal_etl_spark.operators.timeseries import rolling_slope

    ev = T(spark, sf, "events").filter(F.col("user_id") < 20).select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "event_id",
        "value",
    )
    return rolling_slope(
        ev, "event_type", "ts", "event_id", "value", window_rows=10
    ).orderBy("event_type", "ts", "event_id")


REL27_SQL = """
WITH base AS (
  SELECT event_type, ts, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id)::BIGINT AS x,
         CAST(floor(value * 10000) AS BIGINT) AS y_e
  FROM events WHERE user_id < 20
),
frames AS (
  SELECT event_type, ts, event_id, x, y_e,
         count(*) OVER w AS n, sum(x) OVER w AS sx, sum(y_e) OVER w AS sy,
         sum(x * y_e) OVER w AS sxy, sum(x * x) OVER w AS sxx
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_type, ts, event_id, x, y_e,
       CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0 THEN
         CAST(floor(1e6 * (n * sxy - sx * sy)
                    / (n * sxx - sx * sx)) AS BIGINT) END AS slope_e6
FROM frames ORDER BY event_type, ts, event_id"""


CATALOG_EXT9 = {
    "w13_stream_two_level_agg": (w13_stream_two_level_agg, W13_SQL),
    "td12_lsh_quality": (td12_lsh_quality, _td12_sql()),
    "x27_epoch_shuffle": (x27_epoch_shuffle, _x27_sql()),
    "x28_compaction_plan": (x28_compaction_plan, _x28_sql()),
    "tx25_blocklist_filter": (tx25_blocklist_filter, _tx25_sql()),
    "rel27_rolling_slope": (rel27_rolling_slope, REL27_SQL),
}
