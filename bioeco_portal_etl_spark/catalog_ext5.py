"""Round-5 catalog extensions, second batch — 8 entries:

- mm7_wav_clip_stats: per-clip PCM statistics through a REAL mono-16-bit
  WAV encode->decode round-trip (multimodal/wavpcm.py, stdlib wave) — the
  audio twin of mm6: the oracle recomputes the deterministic samples with
  pure SQL arithmetic, so a hash match proves the container codec path
  end-to-end on genuine RIFF bytes;
- x23_scd2_history: type-2 slowly-changing-dimension history built from
  the event log (operators/scd.py) — change-point collapse + lead-stitched
  validity intervals, the point-in-time-state primitive;
- tx20_winnow_fingerprints: winnowing (Schleimer–Wilkerson–Aiken / MOSS)
  rolling k-gram fingerprints with window-min selection (text/winnow.py) —
  the positional fingerprint scheme for substring-level overlap, distinct
  from MinHash's bag-of-shingles similarity;
- w11_stream_static_enrich: LIVE stream broadcast-joined per microbatch
  against a batch dimension, watermarked tumbling agg drained append-mode
  (streaming/joins.py static_enrich) — zero join state by construction;
- dq4_psi_drift: Population Stability Index between time slices with
  e4-floored per-bin terms summed as integers (operators/drift.py);
- ts10_sq8_topk: symmetric-int8 scalar-quantized ANN with integer dot
  scoring (similarity/sq.py);
- dq5_k_anonymity: quasi-identifier k-anonymity audit + rollup
  (operators/anonymity.py).

Same contract as catalog.py: (spark_fn, oracle_sql) pairs over the
driver's synthetic tables, aliased identically on both sides, ending in a
deterministic ORDER BY; integer surfaces BIGINT-cast per PORTABILITY.md
(machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# mm7 — WAV codec round-trip proven by clip statistics
# ---------------------------------------------------------------------------


def mm7_wav_clip_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Silence/clipping/voicing triage stats through the REAL audio codec:
    deterministic sawtooth PCM is encoded to genuine RIFF/WAVE bytes
    (multimodal/wavpcm.py) in one mapInPandas stage, then fully parsed
    back and reduced to (n_samples, energy, min, max, zero-crossings) in a
    second — a binary column crossing a stage boundary, like a real audio
    pipeline. The oracle recomputes the same numbers from the sample
    FORMULA with pure SQL arithmetic; matching hashes prove encode->decode
    is the identity on every sample."""
    from bioeco_portal_etl_spark.multimodal.media import (
        synth_pcm_wav,
        wav_clip_stats,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )
    return wav_clip_stats(synth_pcm_wav(ids, "doc_id")).orderBy("media_id")


def _mm7_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_N_BASE,
        SYNTH_N_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 500),
idx AS (
  SELECT doc_id,
         unnest(range(0, {SYNTH_N_BASE} + doc_id % {SYNTH_N_MOD})) AS i
  FROM ids
),
smp AS (
  SELECT doc_id, i, (doc_id * 13 + i * 7) % 2048 - 1024 AS s FROM idx
),
lagd AS (
  SELECT doc_id, s,
         lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS p
  FROM smp
)
SELECT doc_id AS media_id,
       count(*)::BIGINT AS n_samples,
       sum(s * s)::BIGINT AS energy,
       min(s)::BIGINT AS min_s,
       max(s)::BIGINT AS max_s,
       sum(CASE WHEN p IS NOT NULL AND ((s >= 0) <> (p >= 0))
                THEN 1 ELSE 0 END)::BIGINT AS zero_cross
FROM lagd
GROUP BY doc_id
ORDER BY media_id"""


# ---------------------------------------------------------------------------
# x23 — SCD2 dimension history from the event log
# ---------------------------------------------------------------------------


def x23_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Each user's event_type treated as a time-variant attribute:
    operators/scd.py collapses consecutive duplicates into versions and
    stitches [valid_from, valid_to) intervals with an open current row —
    the SCD2 build a warehouse runs on every dimension change feed. One
    shuffle on user_id serves both window passes."""
    from bioeco_portal_etl_spark.operators.scd import scd2_history

    e = T(spark, sf, "events").select("user_id", "event_type", "ts", "event_id")
    return (
        scd2_history(
            e,
            ["user_id"],
            "event_type",
            ["ts", "event_id"],
            ts_col="ts",
        )
        .filter(F.col("user_id") < 40)
        .orderBy("user_id", "version")
    )


X23_SQL = """
WITH c AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE user_id < 40
),
chg AS (
  SELECT user_id, event_type, ts, event_id, ts AS valid_from
  FROM c
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       row_number() OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS version,
       CAST(CASE WHEN lead(valid_from) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                      IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM chg
ORDER BY user_id, version"""


# ---------------------------------------------------------------------------
# tx20 — winnowing fingerprints (MOSS), per-doc summary
# ---------------------------------------------------------------------------

_WINNOW_K, _WINNOW_W = 5, 4


def tx20_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc winnowing summary (text/winnow.py, k=5 char-grams, w=4
    windows): selected-fingerprint count plus the lexicographic min/max
    fingerprint — enough to pin the full selection set across engines
    without shipping every (doc, fp) row through the gate. Docs shorter
    than k+w-1 chars legitimately vanish (no complete window)."""
    from bioeco_portal_etl_spark.text.winnow import winnow_fingerprints

    d = T(spark, sf, "documents").select("doc_id", "text")
    fps = winnow_fingerprints(
        d, "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
    )
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


def _tx20_sql() -> str:
    k, w = _WINNOW_K, _WINNOW_W
    return f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
pos AS (
  SELECT doc_id, t, length(t) - {k + w - 2} AS nw,
         unnest(range(1, greatest(length(t) - {k - 1}, 0) + 1)) AS p
  FROM d
),
g AS (SELECT doc_id, nw, p, md5(substr(t, p, {k})) AS h FROM pos),
sel AS (
  SELECT doc_id, p, nw,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM g
),
fps AS (
  SELECT doc_id, fp, min(p) AS pos
  FROM sel WHERE p <= nw GROUP BY doc_id, fp
)
SELECT doc_id, count(*)::BIGINT AS n_fp,
       min(fp) AS min_fp, max(fp) AS max_fp
FROM fps
GROUP BY doc_id
ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# w11 — stream-static dimension enrichment (LIVE streaming)
# ---------------------------------------------------------------------------


def w11_stream_static_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """THE production streaming staple the w-family still lacked: a live
    event stream broadcast-joined per microbatch against a BATCH dimension
    (customer market segment keyed by user id; left join so facts without
    a dimension row survive as 'UNKNOWN'), then a watermarked tumbling
    aggregate drained append-mode with availableNow. The stream never
    shuffles for the join and the join itself holds NO state — the static
    side re-resolves every trigger — so state is just the (window,
    segment) aggregate rows inside the watermark horizon. Oracle = the
    batch join+window minus the trailing horizon (w9 drain semantics)."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.joins import static_enrich

    T(spark, sf, "events")  # pins UTC session tz
    dim = (
        T(spark, sf, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(
            F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
        )
        .withWatermark("ts", "2 hours")
    )
    enriched = static_enrich(stream, dim, "user_id").withColumn(
        "segment", F.coalesce("segment", F.lit("UNKNOWN"))
    )
    agg = (
        enriched.groupBy(F.window("ts", "1 hour"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
        )
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("w11_enrich_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w11 stream did not drain")
    return spark.table("w11_enrich_mem").orderBy("window_start", "segment")


W11_SQL = """
WITH dim AS (SELECT c_custkey AS user_id, c_mktsegment AS segment
             FROM customer),
mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events)
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       coalesce(d.segment, 'UNKNOWN') AS segment,
       count(*) AS n_events,
       sum(value::DECIMAL(18,6))::DOUBLE AS sum_value
FROM events e LEFT JOIN dim d USING (user_id)
WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
        <= (SELECT wm FROM mx)
GROUP BY 1, 2
ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# dq4 — PSI distribution drift between time slices
# ---------------------------------------------------------------------------

_DQ4_SPLIT = "2024-01-16"


def dq4_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of the value distribution per event
    type, first half of the month (reference) vs second half (current) —
    the cross-dataset drift score a feature pipeline gates refreshes on,
    next to x18's within-stream CUSUM. Per-bin e4-floored terms sum as
    integers (operators/drift.py psi_drift), so the one ln() sits inside
    a floor and the reduction is associative."""
    from bioeco_portal_etl_spark.operators.drift import psi_drift

    e = T(spark, sf, "events").select(
        "event_type",
        "value",
        (F.col("ts") >= F.lit(_DQ4_SPLIT).cast("timestamp")).alias("is_cur"),
    )
    return psi_drift(e, "event_type", "value", "is_cur").orderBy(
        "event_type"
    )


DQ4_SQL = f"""
WITH binned AS (
  SELECT event_type,
         least(floor(value / 25.0), 19)::BIGINT AS bin,
         CASE WHEN ts >= TIMESTAMP '{_DQ4_SPLIT}' THEN 1 ELSE 0 END AS c
  FROM events
),
counts AS (
  SELECT event_type, bin,
         sum(1 - c)::BIGINT AS n_ref_b, sum(c)::BIGINT AS n_cur_b
  FROM binned GROUP BY event_type, bin
),
terms AS (
  SELECT event_type, n_ref_b, n_cur_b,
         floor(
           ((n_cur_b + 1)::DOUBLE / (sum(n_cur_b) OVER (PARTITION BY event_type) + 20)::DOUBLE
            - (n_ref_b + 1)::DOUBLE / (sum(n_ref_b) OVER (PARTITION BY event_type) + 20)::DOUBLE)
           * ln(((n_cur_b + 1)::DOUBLE / (sum(n_cur_b) OVER (PARTITION BY event_type) + 20)::DOUBLE)
                / ((n_ref_b + 1)::DOUBLE / (sum(n_ref_b) OVER (PARTITION BY event_type) + 20)::DOUBLE))
           * 10000)::BIGINT AS term_e4
  FROM counts
)
SELECT event_type,
       sum(n_ref_b)::BIGINT AS n_ref,
       sum(n_cur_b)::BIGINT AS n_cur,
       sum(term_e4)::BIGINT AS psi_e4
FROM terms
GROUP BY event_type
ORDER BY event_type"""


# ---------------------------------------------------------------------------
# dq5 — k-anonymity audit
# ---------------------------------------------------------------------------


def dq5_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k=5 anonymity audit of customers under the (nation, market
    segment, account-balance bucket) quasi-identifier, reported per
    nation (operators/anonymity.py): how many records sit in groups
    small enough to re-identify by linkage — the release gate next to
    PII redaction. Two-level aggregate; only the first level touches
    row-scale data."""
    from bioeco_portal_etl_spark.operators.anonymity import k_anonymity_audit

    c = T(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    return k_anonymity_audit(
        c, ["c_nationkey", "c_mktsegment", "bal_bucket"], k=5
    ).orderBy("c_nationkey")


DQ5_SQL = """
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
         floor(c_acctbal / 1000)::BIGINT AS bal_bucket
  FROM customer
),
sizes AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket, count(*)::BIGINT AS g_n
  FROM q GROUP BY 1, 2, 3
)
SELECT c_nationkey,
       sum(g_n)::BIGINT AS n_records,
       count(*)::BIGINT AS n_groups,
       sum(CASE WHEN g_n < 5 THEN 1 ELSE 0 END)::BIGINT AS n_risky_groups,
       sum(CASE WHEN g_n < 5 THEN g_n ELSE 0 END)::BIGINT AS n_risky_records,
       min(g_n)::BIGINT AS min_group_size
FROM sizes
GROUP BY c_nationkey
ORDER BY c_nationkey"""


# ---------------------------------------------------------------------------
# ts10 — SQ8 scalar-quantized ANN
# ---------------------------------------------------------------------------


def ts10_sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 neighbors per query over symmetric-int8 scalar-quantized
    codes (similarity/sq.py): L2-normalize, one corpus-wide abs-max
    scale, floor-quantized signed codes, integer dot-product scores —
    the 4x-compressed scan big vector indexes offer next to PQ, with a
    fully integer scoring path so the oracle matches bit-for-bit (see
    sq.py's docstring for why symmetric-global beats per-dim affine when
    the scorer is code·code)."""
    from bioeco_portal_etl_spark.catalog_ext import _query_vectors
    from bioeco_portal_etl_spark.similarity.sq import sq8_topk

    e = T(spark, sf, "embeddings")
    q = _query_vectors(spark, sf)
    return sq8_topk(e, q, "embedding", "vec_id", k=5).orderBy(
        "query_id", "rank"
    )


def _ts10_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_VEC

    return f"""
WITH {_DUCK_VEC},
nv AS (
  SELECT vec_id, list_transform(range(1, 65), i -> e[i] / nrm) AS e
  FROM n
),
dims AS (SELECT unnest(range(1, 65)) AS i),
scale AS (SELECT max(abs(e[i])) AS amax FROM nv CROSS JOIN dims),
codes AS (
  SELECT vec_id, i,
         CASE WHEN amax > 0
              THEN floor(e[i] / amax * 127)::BIGINT
              ELSE 0 END AS c
  FROM nv CROSS JOIN dims CROSS JOIN scale
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         sum(q.c * c.c)::BIGINT AS score
  FROM codes q JOIN codes c USING (i)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, match_id) AS rank
  FROM scored
)
SELECT query_id, match_id, score, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""



CATALOG_EXT5 = {
    "mm7_wav_clip_stats": (mm7_wav_clip_stats, _mm7_sql()),
    "x23_scd2_history": (x23_scd2_history, X23_SQL),
    "tx20_winnow_fingerprints": (tx20_winnow_fingerprints, _tx20_sql()),
    "w11_stream_static_enrich": (w11_stream_static_enrich, W11_SQL),
    "dq4_psi_drift": (dq4_psi_drift, DQ4_SQL),
    "ts10_sq8_topk": (ts10_sq8_topk, _ts10_sql()),
    "dq5_k_anonymity": (dq5_k_anonymity, DQ5_SQL),
}
