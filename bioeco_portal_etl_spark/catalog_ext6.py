"""Round-5 catalog extensions, third batch — 6 entries:

- tx21_bpe_merges: distributed BPE tokenizer-training rounds (text/bpe.py)
  — corpus -> word-frequency table -> weighted adjacent-pair counts ->
  greedy merge applied as a JVM aggregate fold -> recount; the oracle
  replays both rounds with DuckDB's list_reduce using the identical
  string-accumulator fold;
- td11_semantic_dedupe: SemDeDup-style embedding near-dup pruning
  (similarity/semantic_dedupe.py) — broadcast centroid assignment,
  within-cluster pairwise cosine on e4-floored ints, keep the
  diversity-preferred (farthest-from-centroid) representative;
- x24_zorder_layout: Morton-curve clustering audit (operators/zorder.py)
  — bit-interleaved z key from two quantized dims, per-z-bucket (min,
  max) footprints in BOTH source dims: the numbers parquet min/max
  pruning sees after an OPTIMIZE-style rewrite;
- dq6_benford: Benford first-digit audit (operators/benford.py) — digit
  shares vs pre-floored e4 expectations, log10-free on both engines;
- mm8_phash_groups: perceptual average-hash through the REAL PNG decode
  (multimodal/phash.py) + exact-dup group sizes; the oracle recomputes
  the 16-bit hash from the synthetic pixel formula in pure SQL;
- w12_stream_outer_join: LIVE stream-stream LEFT OUTER interval join
  (streaming/joins.py interval_join_outer) — matched rows emit in-batch,
  unmatched only after the opposite watermark passes, so both engine and
  oracle restrict to error events at least 3 h behind the stream's end
  (the provably-complete region; cutoff convention documented inline).

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
# tx21 — BPE tokenizer-training rounds
# ---------------------------------------------------------------------------


def tx21_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Two BPE training rounds over the documents corpus: top-8 pair table
    per round plus the merge each round selected (text/bpe.py). The
    corpus scan reduces to a (word, cnt) table first — the Sennrich
    compression that makes per-round cost vocabulary-sized — and the
    round-1 winner is applied with the greedy left-to-right fold before
    round 2 recounts."""
    from bioeco_portal_etl_spark.text.bpe import bpe_rounds

    docs = T(spark, sf, "documents")
    return bpe_rounds(docs, "text", n_rounds=2, top_k=8).orderBy(
        "round", "rank"
    )


TX21_SQL = r"""
WITH wf AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE w <> '' GROUP BY w
),
sp AS (
  SELECT w, cnt, trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS spaced
  FROM wf
),
p1 AS (
  SELECT pair, sum(cnt)::BIGINT AS cnt
  FROM sp, unnest(list_transform(range(1, len(string_split(spaced, ' '))),
         i -> string_split(spaced, ' ')[i] || ' ' ||
              string_split(spaced, ' ')[i + 1])) AS u(pair)
  GROUP BY pair
),
best1 AS (
  SELECT pair AS mp, string_split(pair, ' ')[1] AS ml,
         string_split(pair, ' ')[2] AS mr
  FROM p1 ORDER BY cnt DESC, pair LIMIT 1
),
r1 AS (
  SELECT 1::BIGINT AS round,
         row_number() OVER (ORDER BY cnt DESC, pair)::BIGINT AS rank,
         pair, cnt, (SELECT mp FROM best1) AS merged_pair
  FROM p1
),
m1 AS (
  SELECT w, cnt,
         list_reduce(string_split(spaced, ' '),
           (acc, x) -> CASE WHEN x = mr AND (acc = ml OR
                                             ends_with(acc, ' ' || ml))
                       THEN acc[1:length(acc) - length(ml)] || ml || mr
                       ELSE acc || ' ' || x END) AS spaced
  FROM sp, best1
),
p2 AS (
  SELECT pair, sum(cnt)::BIGINT AS cnt
  FROM m1, unnest(list_transform(range(1, len(string_split(spaced, ' '))),
         i -> string_split(spaced, ' ')[i] || ' ' ||
              string_split(spaced, ' ')[i + 1])) AS u(pair)
  GROUP BY pair
),
best2 AS (SELECT pair AS mp FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
r2 AS (
  SELECT 2::BIGINT AS round,
         row_number() OVER (ORDER BY cnt DESC, pair)::BIGINT AS rank,
         pair, cnt, (SELECT mp FROM best2) AS merged_pair
  FROM p2
)
SELECT * FROM (
  SELECT * FROM r1 WHERE rank <= 8
  UNION ALL
  SELECT * FROM r2 WHERE rank <= 8)
ORDER BY round, rank
"""


# ---------------------------------------------------------------------------
# td11 — semantic (embedding-space) deduplication
# ---------------------------------------------------------------------------

TD11_THRESHOLD_E4 = 3500


def td11_semantic_dedupe(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup verdict per vector: cluster (injected centroids vec_id<8,
    the ts3 convention — keeps query-time semantics fully oracle-checked),
    centroid similarity, count of better-ranked near-duplicate neighbors
    at cosine >= 0.35, and the keep flag. Pairwise work is blocked by
    cluster; comparisons happen on floor-e4 ints on both engines."""
    from bioeco_portal_etl_spark.similarity.semantic_dedupe import (
        semantic_dedupe,
    )

    e = T(spark, sf, "embeddings")
    cents = e.filter(F.col("vec_id") < 8)
    return semantic_dedupe(
        e, cents, "embedding", "vec_id", TD11_THRESHOLD_E4
    ).orderBy("vec_id")


TD11_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(range(1, 65), i -> e[i] * e[i]),
                          (a, b) -> a + b)) AS nrm
  FROM v
),
cent AS (SELECT vec_id AS cluster, e AS ce, nrm AS cn FROM n WHERE vec_id < 8),
scored AS (
  SELECT m.vec_id, c.cluster,
         floor(list_reduce(list_transform(range(1, 65),
                 i -> m.e[i] * c.ce[i]), (a, b) -> a + b)
               / (m.nrm * c.cn) * 10000)::BIGINT AS cent_sim_e4
  FROM n m CROSS JOIN cent c
),
asg AS (
  SELECT vec_id, cluster, cent_sim_e4 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY cent_sim_e4 DESC, cluster) AS rk
    FROM scored) WHERE rk = 1
),
mem AS (
  SELECT a.cluster, a.cent_sim_e4, n.vec_id, n.e, n.nrm
  FROM asg a JOIN n USING (vec_id)
),
better AS (
  SELECT v2.vec_id, count(*)::BIGINT AS n_better
  FROM mem u JOIN mem v2 ON u.cluster = v2.cluster
         AND u.vec_id <> v2.vec_id
         AND (u.cent_sim_e4 < v2.cent_sim_e4 OR
              (u.cent_sim_e4 = v2.cent_sim_e4 AND u.vec_id < v2.vec_id))
  WHERE floor(list_reduce(list_transform(range(1, 65),
          i -> u.e[i] * v2.e[i]), (a, b) -> a + b)
        / (u.nrm * v2.nrm) * 10000)::BIGINT >= {TD11_THRESHOLD_E4}
  GROUP BY v2.vec_id
)
SELECT a.vec_id, a.cluster, a.cent_sim_e4,
       coalesce(b.n_better, 0)::BIGINT AS n_better,
       (CASE WHEN coalesce(b.n_better, 0) = 0 THEN 1 ELSE 0 END)::BIGINT
         AS keep
FROM asg a LEFT JOIN better b ON a.vec_id = b.vec_id
ORDER BY a.vec_id
"""


# ---------------------------------------------------------------------------
# x24 — Z-order clustering audit
# ---------------------------------------------------------------------------

_Z_A_STEP, _Z_B_STEP, _Z_CAP = 64, 16, 255


def x24_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order locality audit over orders: custkey and order-day are
    quantized (range-preserving floor-division), bit-interleaved into a
    16-bit Morton key, and each 256-key z-bucket (≈ one file of the
    clustered layout) reports its row count and (min, max) footprint in
    BOTH dims — tight spans in both columns are what parquet min/max
    pruning exploits after a zorder_layout rewrite."""
    from bioeco_portal_etl_spark.operators.zorder import (
        quantize,
        z_bucket_profile,
    )

    o = T(spark, sf, "orders").withColumn(
        "order_day", F.expr("datediff(o_orderdate, DATE '1992-01-01')")
    )
    return z_bucket_profile(
        o,
        quantize("o_custkey", _Z_A_STEP, _Z_CAP),
        quantize("order_day", _Z_B_STEP, _Z_CAP),
        bits=8,
        bucket_shift=8,
    ).orderBy("zbucket")


def _x24_sql() -> str:
    from bioeco_portal_etl_spark.operators.zorder import z_expr_sql

    z = z_expr_sql("za", "zb", bits=8, dialect="duck")
    return f"""
WITH q AS (
  SELECT least(CAST(floor(o_custkey / {_Z_A_STEP}) AS BIGINT), {_Z_CAP}) AS za,
         least(CAST(floor(datediff('day', DATE '1992-01-01',
                                   CAST(o_orderdate AS DATE)) / {_Z_B_STEP})
                    AS BIGINT), {_Z_CAP}) AS zb
  FROM orders
),
z AS (SELECT za, zb, {z} AS zv FROM q)
SELECT (zv >> 8)::BIGINT AS zbucket, count(*)::BIGINT AS n_rows,
       min(za)::BIGINT AS a_min, max(za)::BIGINT AS a_max,
       min(zb)::BIGINT AS b_min, max(zb)::BIGINT AS b_max,
       (max(za) - min(za))::BIGINT AS a_span,
       (max(zb) - min(zb))::BIGINT AS b_span
FROM z GROUP BY zv >> 8
ORDER BY zbucket"""


# ---------------------------------------------------------------------------
# dq6 — Benford first-digit audit
# ---------------------------------------------------------------------------


def dq6_benford(spark: SparkSession, sf: str) -> DataFrame:
    """First-digit distribution of lineitem extended prices vs Benford
    expectation (operators/benford.py): per digit 1..9, observed count,
    e4-floored observed share, pre-floored expected share, and the signed
    deviation — the standard forensic screen for fabricated or truncated
    value columns, one scan + a 9-key groupBy."""
    from bioeco_portal_etl_spark.operators.benford import benford_audit

    li = T(spark, sf, "lineitem")
    return benford_audit(li, "l_extendedprice").orderBy("digit")


def _dq6_sql() -> str:
    from bioeco_portal_etl_spark.operators.benford import benford_oracle_sql

    return benford_oracle_sql(
        "SELECT l_extendedprice FROM lineitem", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# mm8 — perceptual hash through the real PNG codec
# ---------------------------------------------------------------------------


def mm8_phash_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Average-hash of every synthetic image through the REAL PNG
    encode->decode path (multimodal/phash.py ahash), plus each image's
    exact-duplicate group size. The oracle recomputes the 16-bit hash
    from the pixel FORMULA in pure SQL — integer block means and strict
    thresholds, so a hash match proves the decode AND the grid math.
    Near-dup pair mining over these hashes is phash_near_pairs (banded;
    pytest-pinned against brute force — the synthetic gradient corpus
    collapses to few distinct hashes, so the pair list is not a useful
    gate surface, but group sizes are)."""
    from bioeco_portal_etl_spark.multimodal.media import synth_rgb_png
    from bioeco_portal_etl_spark.multimodal.phash import (
        ahash,
        phash_dup_groups,
    )

    ids = (
        T(spark, sf, "documents").select("doc_id").filter(F.col("doc_id") < 200)
    )
    hashed = ahash(synth_rgb_png(ids, "doc_id"))
    return phash_dup_groups(hashed).orderBy("media_id")


def _mm8_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id AS mid FROM documents WHERE doc_id < 200),
dims AS (
  SELECT mid, {SYNTH_W_BASE} + mid % {SYNTH_W_MOD} AS w,
         {SYNTH_H_BASE} + mid % {SYNTH_H_MOD} AS h
  FROM ids
),
xs AS (SELECT mid, w, h, unnest(range(0, w)) AS x FROM dims),
ys AS (SELECT mid, w, h, x, unnest(range(0, h)) AS y FROM xs),
px AS (
  SELECT mid, w, h,
         (y * 4) // h AS by, (x * 4) // w AS bx,
         ((mid * 7 + x * 3 + y * 5) % 256
          + (mid * 7 + x * 3 + y * 5 + 11) % 256
          + (mid * 7 + x * 3 + y * 5 + 22) % 256) // 3 AS g
  FROM ys
),
blk AS (
  SELECT mid, by, bx, sum(g) // count(*) AS bm
  FROM px GROUP BY mid, by, bx
),
thr AS (SELECT mid, sum(bm) // 16 AS t FROM blk GROUP BY mid),
hsh AS (
  SELECT b.mid,
         sum(CASE WHEN b.bm > thr.t
             THEN (1::BIGINT << (b.by * 4 + b.bx)) ELSE 0 END)::BIGINT
           AS phash
  FROM blk b JOIN thr ON b.mid = thr.mid GROUP BY b.mid
)
SELECT h.mid AS media_id, d.w::BIGINT AS width, d.h::BIGINT AS height,
       h.phash,
       count(*) OVER (PARTITION BY h.phash)::BIGINT AS group_n
FROM hsh h JOIN dims d ON h.mid = d.mid
ORDER BY media_id"""


# ---------------------------------------------------------------------------
# w12 — LIVE stream-stream LEFT OUTER interval join
# ---------------------------------------------------------------------------


def w12_stream_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Errors LEFT OUTER clicks within ±5 min per user, run as TWO live
    streams (interval_join_outer), watermarked 2 h, drained availableNow.
    Matched rows emit with their batch; NULL-padded rows only emit once
    the GLOBAL watermark (min over both streams' per-stream watermarks)
    proves no partner can arrive, so the comparable region is errors at
    least 3 h (2 h watermark + 5 min interval + slack) behind the SLOWER
    stream's last event: both this query and the oracle filter to
    ``err_ts <= least(max_err_ts, max_click_ts) - 3 h``. The
    final no-data microbatch advances the watermark to flush that
    region's unmatched state."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.joins import interval_join_outer

    events = T(spark, sf, "events")  # pins UTC session tz
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    path = os.path.join(sf, "events.parquet*")

    def stream():
        return spark.readStream.schema(schema).parquet(path)

    errors = (
        stream()
        .filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("err_id"),
            F.col("ts").cast("timestamp").alias("err_ts"),
        )
        .withWatermark("err_ts", "2 hours")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    j = interval_join_outer(
        errors, clicks, "user_id", "err_ts", "click_ts", -300.0, 300.0
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            j.select("err_id", "user_id", "err_ts", "click_ts", "click_value")
            .writeStream.format("memory")
            .queryName("w12_ssoj_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w12 stream did not drain")
    cutoff = events.agg(
        (
            F.least(
                F.max(F.when(F.col("event_type") == "error", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            )
            - F.expr("INTERVAL 3 HOUR")
        ).alias("cut")
    )
    return (
        spark.table("w12_ssoj_mem")
        .crossJoin(F.broadcast(cutoff))
        .filter(F.col("err_ts") <= F.col("cut"))
        .select("err_id", "user_id", "err_ts", "click_ts", "click_value")
        .orderBy("err_id", "click_ts", "click_value")
    )


W12_SQL = """
WITH mx AS (
  SELECT least(max(ts) FILTER (event_type = 'error'),
               max(ts) FILTER (event_type = 'click'))
         - INTERVAL 3 HOUR AS cut
  FROM events)
SELECT e.event_id AS err_id, e.user_id, e.ts AS err_ts,
       c.ts AS click_ts, c.value AS click_value
FROM events e
LEFT JOIN events c ON c.user_id = e.user_id AND c.event_type = 'click'
       AND c.ts >= e.ts - INTERVAL 5 MINUTE
       AND c.ts <= e.ts + INTERVAL 5 MINUTE
CROSS JOIN mx
WHERE e.event_type = 'error' AND e.ts <= mx.cut
ORDER BY err_id, click_ts, click_value
"""


CATALOG_EXT6 = {
    "tx21_bpe_merges": (tx21_bpe_merges, TX21_SQL),
    "td11_semantic_dedupe": (td11_semantic_dedupe, TD11_SQL),
    "x24_zorder_layout": (x24_zorder_layout, _x24_sql()),
    "dq6_benford": (dq6_benford, _dq6_sql()),
    "mm8_phash_groups": (mm8_phash_groups, _mm8_sql()),
    "w12_stream_outer_join": (w12_stream_outer_join, W12_SQL),
}
