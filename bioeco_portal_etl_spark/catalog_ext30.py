"""Round-6 catalog extensions, tenth batch — 5 entries (catalog: 300):

- gr21_edge_support: per-edge triangle-support histogram; support-0
  edges are LOCAL BRIDGES (weak ties) — the community-boundary signal
  and the truss-decomposition primitive (graph/triangles.py
  edge_support);
- dq16_id_gaps: identifier-sequence completeness audit (missing ids,
  gap runs, largest hole) — the ingestion-loss detector;
- ts24_norm_profile: embedding squared-norm histogram in exact
  quantized integers — the norm-outlier QA every embedding corpus runs
  (un-normalized rows break cosine assumptions);
- td15_soft_dedupe_weights: per-doc training weight 1e6/cluster_size
  from the prefix clusters — soft dedup (keep every copy, down-weight
  the loss) as a table;
- mm22_crest_factor: peak-to-RMS crest factor per clip COMPOSED from
  the wav_clip_stats Arrow stage's integer outputs (peak, energy, n) —
  the dynamics/clipping-risk audio metric.

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr21 — edge triangle-support histogram (local bridges)
# ---------------------------------------------------------------------------


def gr21_edge_support(spark: SparkSession, sf: str) -> DataFrame:
    """Support histogram over the 1%-slice co-order supplier graph (the
    gr2/gr18 fixture): the support-0 row counts local bridges."""
    from bioeco_portal_etl_spark.catalog_ext22 import _coorder_edges
    from bioeco_portal_etl_spark.graph.triangles import edge_support

    return edge_support(_coorder_edges(spark, sf)).orderBy("support")


def _gr21_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext22 import _COORDER_SQL
    from bioeco_portal_etl_spark.graph.triangles import duck_edge_support

    body = duck_edge_support(_COORDER_SQL)
    return f"""
WITH {body}
SELECT support, n_edges FROM esup ORDER BY support"""


# ---------------------------------------------------------------------------
# dq16 — identifier-sequence gap audit
# ---------------------------------------------------------------------------


def dq16_id_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """One-row completeness report over o_orderkey: (n_ids, min_id,
    max_id, n_missing, n_gap_runs, max_gap) — missing = holes in
    [min, max]; a gap run is a maximal missing stretch (lag deltas > 1
    on the DISTINCT sorted ids; the window sees ndv rows, and at 100 TB
    the same lag runs per range-partition with boundary stitching)."""
    ids = (
        T(spark, sf, "orders")
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    w = Window.orderBy("id")
    d = ids.select(
        "id", (F.col("id") - F.lag("id").over(w)).alias("delta")
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_ids"),
        F.min("id").cast("long").alias("min_id"),
        F.max("id").cast("long").alias("max_id"),
        (F.max("id") - F.min("id") + 1 - F.count(F.lit(1)))
        .cast("long")
        .alias("n_missing"),
        F.sum((F.col("delta") > 1).cast("long")).cast("long").alias(
            "n_gap_runs"
        ),
        F.coalesce(F.max(F.col("delta") - 1), F.lit(0))
        .cast("long")
        .alias("max_gap"),
    )


def _dq16_sql() -> str:
    return """
WITH ids AS (SELECT DISTINCT o_orderkey AS id FROM orders),
d AS (
  SELECT id, id - lag(id) OVER (ORDER BY id) AS delta FROM ids
)
SELECT count(*)::BIGINT AS n_ids,
       min(id)::BIGINT AS min_id,
       max(id)::BIGINT AS max_id,
       (max(id) - min(id) + 1 - count(*))::BIGINT AS n_missing,
       sum(CASE WHEN delta > 1 THEN 1 ELSE 0 END)::BIGINT AS n_gap_runs,
       coalesce(max(delta - 1), 0)::BIGINT AS max_gap
FROM d"""


# ---------------------------------------------------------------------------
# ts24 — embedding norm profile
# ---------------------------------------------------------------------------


def ts24_norm_profile(spark: SparkSession, sf: str) -> DataFrame:
    """(bucket, n_vecs, min_norm2_q, max_norm2_q): histogram of the
    EXACT quantized squared norm (Σ floor(x·1e4)² per vector — integer,
    no sqrt, no float sum) in 5e7-wide buckets. Rows far from the mode
    are the un-normalized/corrupt vectors cosine search mis-scores."""
    e = T(spark, sf, "embeddings")
    q = e.select(
        "vec_id",
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 10000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, xq: acc + xq * xq,
        ).alias("norm2_q"),
    )
    b = q.select(
        "norm2_q", F.expr("norm2_q div 50000000").alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("norm2_q").cast("long").alias("min_norm2_q"),
            F.max("norm2_q").cast("long").alias("max_norm2_q"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n_vecs",
                "min_norm2_q", "max_norm2_q")
        .orderBy("bucket")
    )


def _ts24_sql() -> str:
    return """
WITH q AS (
  SELECT vec_id,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(embedding,
               x -> CAST(floor(x::DOUBLE * 10000) AS BIGINT)
                    * CAST(floor(x::DOUBLE * 10000) AS BIGINT))),
           (a, b) -> a + b) AS norm2_q
  FROM embeddings
)
SELECT (norm2_q // 50000000)::BIGINT AS bucket,
       count(*)::BIGINT AS n_vecs,
       min(norm2_q)::BIGINT AS min_norm2_q,
       max(norm2_q)::BIGINT AS max_norm2_q
FROM q GROUP BY 1 ORDER BY bucket"""


# ---------------------------------------------------------------------------
# td15 — soft-dedupe loss weights
# ---------------------------------------------------------------------------


def td15_soft_dedupe_weights(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, cluster_size, weight_e6): every document kept, weighted
    1e6 div cluster_size under the prefix-fingerprint clusters — the
    soft-dedup alternative to keep-first (total cluster weight stays ~1
    so duplicated content isn't over-trained). One hash groupBy + one
    broadcast-size join back."""
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.md5(F.substring(F.coalesce("text", F.lit("")), 1, 100)).alias("fp"),
    )
    sizes = d.groupBy("fp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        d.join(sizes, "fp")
        .select(
            "doc_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.expr("CAST(1000000 div cluster_size AS BIGINT)").alias(
                "weight_e6"
            ),
        )
        .orderBy("doc_id")
    )


def _td15_sql() -> str:
    return """
WITH d AS (
  SELECT doc_id, md5(substr(coalesce(text, ''), 1, 100)) AS fp
  FROM documents
),
sizes AS (SELECT fp, count(*)::BIGINT AS cluster_size FROM d GROUP BY fp)
SELECT doc_id, cluster_size,
       CAST(1000000 // cluster_size AS BIGINT) AS weight_e6
FROM d JOIN sizes USING (fp) ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# mm22 — crest factor (peak-to-RMS dynamics)
# ---------------------------------------------------------------------------


def mm22_crest_factor(spark: SparkSession, sf: str) -> DataFrame:
    """(media_id, n_samples, peak, energy, crest_e4): crest_e4 =
    floor(1e4·peak / sqrt(energy/n)) — pure IEEE sqrt/÷ over the
    integer outputs of the wav_clip_stats Arrow stage (peak from
    max/min, energy, n), so the metric itself runs JVM-side; silent
    clips report NULL."""
    from bioeco_portal_etl_spark.multimodal.media import (
        synth_pcm_wav,
        wav_clip_stats,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 100)
    )
    stats = wav_clip_stats(synth_pcm_wav(ids, "doc_id"))
    return (
        stats.select(
            "media_id",
            F.col("n_samples").cast("long").alias("n_samples"),
            F.greatest(F.col("max_s"), -F.col("min_s"))
            .cast("long")
            .alias("peak"),
            F.col("energy").cast("long").alias("energy"),
        )
        .withColumn(
            "crest_e4",
            F.expr(
                "CASE WHEN energy > 0 THEN CAST(floor(10000 * peak"
                " / sqrt(CAST(energy AS DOUBLE) / n_samples)) AS BIGINT)"
                " END"
            ),
        )
        .orderBy("media_id")
    )


def _mm22_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_N_BASE,
        SYNTH_N_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
dims AS (
  SELECT doc_id, {SYNTH_N_BASE} + doc_id % {SYNTH_N_MOD} AS n FROM ids
),
samples AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
vals AS (
  SELECT doc_id, n, (doc_id * 13 + i * 7) % 2048 - 1024 AS s FROM samples
),
agg AS (
  SELECT doc_id, max(n)::BIGINT AS n_samples,
         greatest(max(s), -min(s))::BIGINT AS peak,
         CAST(sum(s * s) AS BIGINT) AS energy
  FROM vals GROUP BY doc_id
)
SELECT doc_id AS media_id, n_samples, peak, energy,
       CASE WHEN energy > 0 THEN
         CAST(floor(10000 * peak
              / sqrt(CAST(energy AS DOUBLE) / n_samples)) AS BIGINT) END
         AS crest_e4
FROM agg ORDER BY media_id"""


CATALOG_EXT30 = {
    "gr21_edge_support": (gr21_edge_support, _gr21_sql()),
    "dq16_id_gaps": (dq16_id_gaps, _dq16_sql()),
    "ts24_norm_profile": (ts24_norm_profile, _ts24_sql()),
    "td15_soft_dedupe_weights": (td15_soft_dedupe_weights, _td15_sql()),
    "mm22_crest_factor": (mm22_crest_factor, _mm22_sql()),
}
