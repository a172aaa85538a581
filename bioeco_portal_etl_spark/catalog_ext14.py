"""Round-5 catalog extensions, eleventh batch — 5 entries:

- gr11_hyperball: HyperBall (Boldi-Rosa-Vigna 2011) neighborhood
  function — per-node |B(v, r)| for r = 0..2 via mergeable HLL register
  sketches (graph/hyperball.py), the linear-in-|E| distance primitive
  that replaces all-pairs BFS on billion-edge graphs;
- mm10_patch_grid: ViT-style patch tiling from REAL PNG header decode —
  grid shape + per-tile offsets/extents derived from metadata only, the
  payload never re-enters the plan (multimodal/media.py patch_grid);
- rel30_variant_shred: semi-structured shredding through Spark 4's
  VariantType — parse_json once, typed try_variant_get extraction, then
  relational aggregation (functions/variant.py); the oracle mirrors the
  SEMANTICS with DuckDB's JSON extractors;
- w16_stream_hll_distinct: LIVE streaming windowed distinct-count with
  sketch-bounded state — two chained streaming aggregates (register max
  -> estimate), at most m=64 state rows per window no matter how many
  distinct users (streaming/windows.py windowed_distinct_hll);
- ts16_sq_distortion: int8 scalar-quantization QA — per-label
  reconstruction-error stats of the ts10 SQ index, exact e12 integers
  (per-dimension floor BEFORE the integer fold; similarity/sq.py
  sq_distortion).

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr11 — HyperBall neighborhood function
# ---------------------------------------------------------------------------


def gr11_hyperball(spark: SparkSession, sf: str) -> DataFrame:
    """Ball sizes |B(v, r)|, r = 0..2, for every supplier over the
    adjacent-line supplier chain graph (gr3's sparse edge set, so balls
    actually grow with r) — HLL-register propagation, linear-counting
    small-range estimator (graph/hyperball.py)."""
    from bioeco_portal_etl_spark.graph.hyperball import hyperball_neighborhood

    from bioeco_portal_etl_spark.catalog_ext2 import _chain_supplier_edges

    edges = _chain_supplier_edges(spark, sf)
    nodes = T(spark, sf, "supplier").select(F.col("s_suppkey").alias("node"))
    return hyperball_neighborhood(edges, nodes, radius=2).orderBy("r", "node")


def _gr11_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext2 import _CHAIN_EDGES_SQL
    from bioeco_portal_etl_spark.graph.hyperball import duck_hyperball

    return f"""
WITH {duck_hyperball(
        _CHAIN_EDGES_SQL,
        "SELECT s_suppkey AS node FROM supplier",
        2,
    )}
SELECT node, r, ball_est FROM hb ORDER BY r, node"""


# ---------------------------------------------------------------------------
# mm10 — ViT patch tiling from real header decode
# ---------------------------------------------------------------------------

_MM10_PATCH = 4


def mm10_patch_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Patch-tile layout for every synthetic PNG (doc_id < 120): dims
    come off the REAL png header parser riding the decode_fn seam, the
    grid/offset arithmetic is pure built-ins + one explode — tiling is a
    metadata-sized job; pixels move only in a downstream gather."""
    from bioeco_portal_etl_spark.multimodal.media import (
        decode_media_metadata,
        patch_grid,
        synth_rgb_png,
    )
    from bioeco_portal_etl_spark.multimodal.png import png_header_fn

    ids = (
        T(spark, sf, "documents").select("doc_id").filter(F.col("doc_id") < 120)
    )
    meta = decode_media_metadata(
        synth_rgb_png(ids, "doc_id"), decode_fn=png_header_fn
    )
    return patch_grid(meta, patch=_MM10_PATCH).orderBy("media_id", "patch_id")


def _mm10_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    p = _MM10_PATCH
    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
dims AS (
  SELECT doc_id,
         {SYNTH_W_BASE} + doc_id % {SYNTH_W_MOD} AS w,
         {SYNTH_H_BASE} + doc_id % {SYNTH_H_MOD} AS h
  FROM ids
),
g AS (
  SELECT doc_id, w, h,
         (w + {p - 1}) // {p} AS nx, (h + {p - 1}) // {p} AS ny
  FROM dims
),
t AS (SELECT doc_id, w, h, nx, ny, unnest(range(0, nx * ny)) AS pid FROM g)
SELECT doc_id AS media_id, nx::BIGINT AS n_x, ny::BIGINT AS n_y,
       pid::BIGINT AS patch_id,
       ((pid % nx) * {p})::BIGINT AS px0,
       ((pid // nx) * {p})::BIGINT AS py0,
       least({p}, w - (pid % nx) * {p})::BIGINT AS pw,
       least({p}, h - (pid // nx) * {p})::BIGINT AS ph
FROM t ORDER BY media_id, patch_id"""


# ---------------------------------------------------------------------------
# rel30 — VariantType shredding
# ---------------------------------------------------------------------------


def rel30_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    """events.props parsed ONCE to VARIANT, 'k' extracted typed
    (try_variant_get -> NULL-permissive), then a relational rollup per
    (event_type, k % 8) — the parse-once/extract-many ingest shape
    warehouses use for log props columns (functions/variant.py)."""
    from bioeco_portal_etl_spark.functions.variant import shred_variant

    e = T(spark, sf, "events").select("event_type", "props")
    sh = shred_variant(
        e, "props", {"k": ("$.k", "bigint")}, keep=["event_type"]
    )
    return (
        sh.groupBy(
            "event_type", (F.col("k") % 8).cast("long").alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
        .orderBy("event_type", "k_bucket")
    )


REL30_SQL = """
WITH sh AS (
  SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events
)
SELECT event_type, (k % 8)::BIGINT AS k_bucket,
       count(*)::BIGINT AS n_events,
       min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k,
       sum(k)::BIGINT AS sum_k
FROM sh GROUP BY event_type, k_bucket
ORDER BY event_type, k_bucket"""


# ---------------------------------------------------------------------------
# w16 — LIVE streaming windowed distinct via HLL sketch state
# ---------------------------------------------------------------------------


def w16_stream_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly distinct-user estimates from a LIVE stream with
    sketch-bounded state (64 register rows per window, not one per
    user): chained streaming aggregates drained availableNow in append
    mode — a window emits once the 2 h watermark passes its end, so the
    result equals the batch HLL restricted to window_end <= max(ts) - 2h
    (exactly what the oracle computes)."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.windows import windowed_distinct_hll

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
    res = windowed_distinct_hll(stream, "1 hour", "user_id")
    with scoped_shuffle_partitions(spark, 8):
        q = (
            res.writeStream.format("memory")
            .queryName("w16_hll_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w16 stream did not drain")
    return spark.table("w16_hll_mem").orderBy("window_start")


def _w16_sql() -> str:
    from bioeco_portal_etl_spark.sketches.hll import duck_hll

    hll = duck_hll(
        "(SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, user_id"
        " FROM events)",
        "wstart",
        "user_id",
    )
    return f"""
WITH mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events),
{hll.lstrip()}
SELECT grp AS window_start, est_distinct
FROM hll, mx WHERE grp + INTERVAL '1 hour' <= wm
ORDER BY window_start"""


# ---------------------------------------------------------------------------
# ts16 — SQ int8 quantization distortion audit
# ---------------------------------------------------------------------------


def ts16_sq_distortion(spark: SparkSession, sf: str) -> DataFrame:
    """Reconstruction-error QA of the ts10 symmetric-int8 layout,
    rolled up per label: n_vecs, floored mean and max of the exact e12
    squared-L2 error between each normalized vector and its dequantized
    codes — the accept/reject table read before trading float32 for SQ
    (similarity/sq.py sq_distortion)."""
    from bioeco_portal_etl_spark.similarity.sq import sq_distortion

    e = T(spark, sf, "embeddings")
    d = sq_distortion(e, "embedding", "vec_id")
    lab = e.select("vec_id", F.col("label").cast("long").alias("label"))
    return (
        d.join(lab, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr(
                "CAST(sum(mse_e12) div count(1) AS BIGINT)"
            ).alias("avg_mse_e12"),
            F.max("mse_e12").cast("long").alias("max_mse_e12"),
        )
        .orderBy("label")
    )


def _ts16_sql() -> str:
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
  SELECT vec_id, e,
         list_transform(range(1, 65),
                        i -> CASE WHEN amax > 0
                                  THEN floor(e[i] / amax * 127)::BIGINT
                                  ELSE 0 END) AS c
  FROM nv CROSS JOIN scale
),
errs AS (
  SELECT vec_id,
         list_reduce(
           list_transform(range(1, 65),
             i -> floor((e[i] - c[i] / 127.0 * amax)
                        * (e[i] - c[i] / 127.0 * amax)
                        * 1000000000000.0)::BIGINT),
           (a, b) -> a + b) AS mse_e12
  FROM codes CROSS JOIN scale
)
SELECT emb.label::BIGINT AS label, count(*)::BIGINT AS n_vecs,
       (sum(mse_e12)::BIGINT // count(*)) AS avg_mse_e12,
       max(mse_e12)::BIGINT AS max_mse_e12
FROM errs JOIN embeddings emb USING (vec_id)
GROUP BY emb.label ORDER BY label"""


CATALOG_EXT14 = {
    "gr11_hyperball": (gr11_hyperball, _gr11_sql()),
    "mm10_patch_grid": (mm10_patch_grid, _mm10_sql()),
    "rel30_variant_shred": (rel30_variant_shred, REL30_SQL),
    "w16_stream_hll_distinct": (w16_stream_hll_distinct, _w16_sql()),
    "ts16_sq_distortion": (ts16_sq_distortion, _ts16_sql()),
}
