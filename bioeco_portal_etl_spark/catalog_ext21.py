"""Round-6 catalog extensions, first batch — 5 entries:

- mm14_jpeg_roundtrip: per-image pixel statistics through a REAL baseline
  JPEG encode->decode round-trip (multimodal/jpeg.py, pure stdlib:
  Huffman + DPCM + dequant + IDCT) — the lossy-codec twin of
  mm6_png_channel_stats; block-constant fixtures + all-ones quantization
  make the round-trip provably exact, so the arithmetic oracle certifies
  the full decoder path;
- mm15_wav_silence_trim: leading/trailing low-amplitude trim bounds and
  retained energy through the real RIFF parse (media.wav_trim_bounds) —
  the silence-trim stage before windowed audio featurizers;
- gr17_adamic_adar: common-neighbor link prediction with the 1/ln(deg)
  Adamic-Adar weight over the same-day customer co-activity graph
  (graph/linkpred.py) — wedge join with a hub cap, never all-pairs;
- ts19_centroid_stats: per-label embedding centroid norm and within-label
  scatter in one pass (similarity/centroids.py) — e4-quantized BEFORE
  aggregation so cross-row float order can't flip the hash;
- dq12_split_balance: realized stratum mix per hash split vs the corpus
  mix (operators/balance.py) — the stratification audit next to dq3's
  leakage audit.

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
# mm14 — JPEG round-trip channel stats
# ---------------------------------------------------------------------------


def mm14_jpeg_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Pixel stats through the REAL lossy codec: block-constant gray
    tilings are encoded to genuine baseline JPEG bytes and fully decoded
    (Huffman, DC DPCM, dequantize, IDCT, edge-padding crop) before the
    per-channel reduction. All-ones quantization + tile-constant blocks
    make decode(encode(px)) == px exactly (multimodal/jpeg.py docstring
    has the proof), so the oracle recomputes the tile FORMULA with pure
    SQL arithmetic and a hash match certifies the decoder end-to-end."""
    from bioeco_portal_etl_spark.multimodal.media import (
        png_channel_stats,
        synth_gray_jpeg,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 150)
    )
    return png_channel_stats(synth_gray_jpeg(ids, "doc_id")).orderBy(
        "media_id", "channel"
    )


def _mm14_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        JPEG_H_BASE,
        JPEG_H_MOD,
        JPEG_W_BASE,
        JPEG_W_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 150),
dims AS (
  SELECT doc_id,
         {JPEG_W_BASE} + doc_id % {JPEG_W_MOD} AS w,
         {JPEG_H_BASE} + doc_id % {JPEG_H_MOD} AS h
  FROM ids
),
xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
ys AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
px AS (
  SELECT doc_id,
         (doc_id * 31 + (x // 8) * 7 + (y // 8) * 11) % 256 AS v
  FROM ys
)
SELECT doc_id AS media_id, 0::BIGINT AS channel,
       count(*)::BIGINT AS n_px,
       CAST(sum(v) // count(*) AS BIGINT) AS mean_v,
       min(v)::BIGINT AS min_v,
       max(v)::BIGINT AS max_v
FROM px
GROUP BY doc_id
ORDER BY media_id, channel"""


# ---------------------------------------------------------------------------
# mm15 — WAV silence-trim bounds
# ---------------------------------------------------------------------------


def mm15_wav_silence_trim(spark: SparkSession, sf: str) -> DataFrame:
    """Trim points (first/last |s| >= 128 sample) + retained energy for
    100 synthetic PCM clips through the real RIFF round-trip
    (media.wav_trim_bounds)."""
    from bioeco_portal_etl_spark.multimodal.media import (
        synth_pcm_wav,
        wav_trim_bounds,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 100)
    )
    return wav_trim_bounds(synth_pcm_wav(ids, "doc_id"), threshold=128).orderBy(
        "media_id"
    )


def _mm15_sql() -> str:
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
  SELECT doc_id, n, i, (doc_id * 13 + i * 7) % 2048 - 1024 AS s
  FROM samples
),
loud AS (
  SELECT doc_id, min(i)::BIGINT AS lo, max(i)::BIGINT AS hi
  FROM vals WHERE abs(s) >= 128 GROUP BY doc_id
),
kept AS (
  SELECT v.doc_id, CAST(sum(v.s * v.s) AS BIGINT) AS ke
  FROM vals v JOIN loud l
    ON l.doc_id = v.doc_id AND v.i BETWEEN l.lo AND l.hi
  GROUP BY v.doc_id
)
SELECT d.doc_id AS media_id, d.n::BIGINT AS n_samples,
       l.lo AS first_loud, l.hi AS last_loud,
       CAST(coalesce(l.lo + (d.n - 1 - l.hi), d.n) AS BIGINT) AS n_trimmed,
       k.ke AS kept_energy
FROM dims d
LEFT JOIN loud l ON l.doc_id = d.doc_id
LEFT JOIN kept k ON k.doc_id = d.doc_id
ORDER BY media_id"""


# ---------------------------------------------------------------------------
# gr17 — Adamic-Adar link prediction over the co-activity graph
# ---------------------------------------------------------------------------


def gr17_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    """Top-500 non-adjacent customer pairs sharing >= 2 co-activity
    neighbors, scored by Adamic-Adar (graph/linkpred.py): each shared
    neighbor w contributes floor(1e6 / ln(deg_w)) — floored per-term so
    the sum is an integer sum. Hub middles (deg > 200) are dropped
    (their weight is noise-level while dominating the wedge volume).
    The top-k cut is the serving surface (recommend the strongest
    candidate links) and keeps the result dimension-sized at any SF —
    the full pair table is quadratic-ish in cohort overlap (682k rows at
    sf0.01) and is an intermediate, not a deliverable. Deterministic
    total order: (aa_e6 DESC, u, v)."""
    from bioeco_portal_etl_spark.catalog_ext7 import _coactivity_edges
    from bioeco_portal_etl_spark.graph.linkpred import adamic_adar

    return (
        # co-activity emits both orderings by construction, so the
        # symmetrizing union inside adamic_adar is pure duplication —
        # skip it (round-12; the dedupe still runs, keyed by src)
        adamic_adar(
            _coactivity_edges(spark, sf),
            max_degree=200,
            min_common=2,
            pre_symmetrized=True,
        )
        .orderBy(F.desc("aa_e6"), "u", "v")
        .limit(500)
    )


def _gr17_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext7 import _COACT_EDGES_SQL
    from bioeco_portal_etl_spark.graph.linkpred import duck_adamic_adar

    body = duck_adamic_adar(_COACT_EDGES_SQL, max_degree=200, min_common=2)
    return f"""
WITH {body}
SELECT u, v, n_common, aa_e6 FROM aa
ORDER BY aa_e6 DESC, u, v LIMIT 500"""


# ---------------------------------------------------------------------------
# ts19 — per-label centroid statistics
# ---------------------------------------------------------------------------


def ts19_centroid_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid squared norm + within-label scatter over the
    embeddings table (similarity/centroids.py), e4-quantized integer
    geometry throughout."""
    from bioeco_portal_etl_spark.similarity.centroids import (
        label_centroid_stats,
    )

    e = T(spark, sf, "embeddings").select(
        F.col("label").cast("long").alias("label"), "embedding"
    )
    return label_centroid_stats(e, "label", "embedding").orderBy("label")


def _ts19_sql() -> str:
    from bioeco_portal_etl_spark.similarity.centroids import (
        duck_label_centroid_stats,
    )

    body = duck_label_centroid_stats(
        "SELECT CAST(label AS BIGINT) AS label, embedding FROM embeddings",
        dims=64,
    )
    return f"""
WITH {body}
SELECT label, n_vecs, centroid_q2, ssd_q FROM cstats ORDER BY label"""


# ---------------------------------------------------------------------------
# dq12 — split stratification balance
# ---------------------------------------------------------------------------


def dq12_split_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Realized language mix of the deterministic 90/10 md5-bucket split
    vs the corpus mix (operators/balance.py) — skew_e6 = 0 means the
    split mirrors the corpus for that language."""
    from bioeco_portal_etl_spark.operators.balance import split_balance
    from bioeco_portal_etl_spark.operators.sampling import hash_bucket

    d = T(spark, sf, "documents").select(
        F.when(hash_bucket("doc_id") < 9000, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
        F.col("lang").alias("stratum"),
    )
    return split_balance(d, "split", "stratum").orderBy("split", "stratum")


def _dq12_sql() -> str:
    from bioeco_portal_etl_spark.operators.balance import duck_split_balance

    # md5-hex first-8-chars -> int bucket, the dq3 oracle's mirror of
    # operators/sampling.hash_bucket
    bucket = (
        "list_reduce(list_transform(range(1, 9),"
        " i -> (strpos('0123456789abcdef',"
        " substr(md5(doc_id::VARCHAR), i, 1)) - 1)::BIGINT),"
        " (a, x) -> a * 16 + x) % 10000"
    )
    src = (
        f"SELECT CASE WHEN {bucket} < 9000 THEN 'train' ELSE 'val' END"
        " AS split, lang AS stratum FROM documents"
    )
    body = duck_split_balance(src)
    return f"""
WITH {body}
SELECT split, stratum, n, share_e6, corpus_share_e6, skew_e6
FROM sbal ORDER BY split, stratum"""


CATALOG_EXT21 = {
    "mm14_jpeg_roundtrip": (mm14_jpeg_roundtrip, _mm14_sql()),
    "mm15_wav_silence_trim": (mm15_wav_silence_trim, _mm15_sql()),
    "gr17_adamic_adar": (gr17_adamic_adar, _gr17_sql()),
    "ts19_centroid_stats": (ts19_centroid_stats, _ts19_sql()),
    "dq12_split_balance": (dq12_split_balance, _dq12_sql()),
}
