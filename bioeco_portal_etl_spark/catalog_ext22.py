"""Round-6 catalog extensions, second batch — 5 entries:

- tx34_ngram_novelty: per-doc first-occurrence trigram fraction
  (text/novelty.py) — the corpus-growth novelty curve;
- x40_skyline_2d: Pareto front over parts (min retail-price cents, max
  size) via the sort-scan window formulation (operators/skyline.py) —
  O(n log n), never the quadratic dominance self-join;
- gr18_clustering_coeff: per-node local clustering coefficient over the
  1%-slice co-order supplier graph (graph/triangles.py
  local_clustering) — degree-oriented triangle enumeration, each
  triangle counted once then fanned to its three corners;
- mm16_pixel_gini: per-channel value-distribution Gini impurity through
  the REAL PNG decode (multimodal/media.py image_histogram_stats) —
  rational in the counts, so integer-exact with no transcendental;
- x41_nucleus_coverage: top-p vocabulary coverage per language
  (text/nucleus.py) — nucleus size and exact covered mass at p = 0.8.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs aliased
identically on both sides, deterministic ORDER BY, BIGINT-cast integer
surfaces per PORTABILITY.md.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# tx34 — n-gram novelty curve
# ---------------------------------------------------------------------------


def tx34_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-trigram novelty per document: how much of each doc first
    appears THERE (min doc_id over the corpus order) — text/novelty.py."""
    from bioeco_portal_etl_spark.text.novelty import ngram_novelty

    d = T(spark, sf, "documents")
    return ngram_novelty(d, "doc_id", "text", k=3).orderBy("doc_id")


def _tx34_sql() -> str:
    from bioeco_portal_etl_spark.text.novelty import duck_ngram_novelty

    body = duck_ngram_novelty("SELECT doc_id, text FROM documents", k=3)
    return f"""
WITH {body}
SELECT doc_id, n_grams, n_novel, novelty_e6 FROM nov ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# x40 — 2-D skyline (Pareto front)
# ---------------------------------------------------------------------------


def x40_skyline_2d(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto-optimal parts: no other part is both cheaper (retail
    cents) and at-least-as-large — operators/skyline.py sort-scan
    windows, integer cents quantization on both engines."""
    from bioeco_portal_etl_spark.operators.skyline import skyline_2d

    p = T(spark, sf, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice").cast("double") * 100)
        .cast("long")
        .alias("price_c"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return skyline_2d(p, "price_c", "p_size").orderBy("p_partkey")


def _x40_sql() -> str:
    from bioeco_portal_etl_spark.operators.skyline import duck_skyline_2d

    body = duck_skyline_2d(
        "SELECT p_partkey,"
        " CAST(floor(p_retailprice::DOUBLE * 100) AS BIGINT) AS price_c,"
        " CAST(p_size AS BIGINT) AS p_size FROM part",
        "price_c",
        "p_size",
    )
    return f"""
WITH {body}
SELECT p_partkey, price_c, p_size FROM sky ORDER BY p_partkey"""


# ---------------------------------------------------------------------------
# gr18 — local clustering coefficient
# ---------------------------------------------------------------------------


def _coorder_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers co-appearing in the same order, 1%-order slice — the
    gr2 fixture (the unsliced synthetic co-order graph is near-complete;
    the slice makes triangle structure non-trivial, the operator's
    orientation bound is what carries to real power-law graphs)."""
    li = T(spark, sf, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    src = li.select("l_orderkey", "l_suppkey")
    a, b = src.alias("a"), src.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
    )


_COORDER_SQL = """SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM (SELECT l_orderkey, l_suppkey FROM lineitem
        WHERE l_orderkey % 100 = 0) a
  JOIN (SELECT l_orderkey, l_suppkey FROM lineitem
        WHERE l_orderkey % 100 = 0) b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey"""


def gr18_clustering_coeff(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node local clustering coefficient (graph/triangles.py
    local_clustering) over the co-order supplier graph: lcc_e6 =
    (2e6·T(v)) div (deg·(deg-1)) for deg >= 2 nodes."""
    from bioeco_portal_etl_spark.graph.triangles import local_clustering

    return local_clustering(_coorder_edges(spark, sf)).orderBy("node")


def _gr18_sql() -> str:
    from bioeco_portal_etl_spark.graph.triangles import duck_local_clustering

    body = duck_local_clustering(_COORDER_SQL)
    return f"""
WITH {body}
SELECT node, deg, n_tri, lcc_e6 FROM lcc ORDER BY node"""


# ---------------------------------------------------------------------------
# mm16 — pixel-distribution Gini through the real PNG codec
# ---------------------------------------------------------------------------


def mm16_pixel_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Per-channel distinct-value count, mode, and Gini impurity for 150
    synthetic RGB rasters through the REAL PNG encode->decode
    (multimodal/media.py image_histogram_stats). Gini is rational in
    the histogram counts — integer-exact, no transcendentals."""
    from bioeco_portal_etl_spark.multimodal.media import (
        image_histogram_stats,
        synth_rgb_png,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 150)
    )
    return image_histogram_stats(synth_rgb_png(ids, "doc_id")).orderBy(
        "media_id", "channel"
    )


def _mm16_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 150),
dims AS (
  SELECT doc_id,
         {SYNTH_W_BASE} + doc_id % {SYNTH_W_MOD} AS w,
         {SYNTH_H_BASE} + doc_id % {SYNTH_H_MOD} AS h
  FROM ids
),
xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
ys AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
cs AS (SELECT doc_id, x, y, unnest([0, 1, 2]) AS c FROM ys),
px AS (
  SELECT doc_id, c AS channel,
         (doc_id * 7 + x * 3 + y * 5 + c * 11) % 256 AS v
  FROM cs
),
hist AS (
  SELECT doc_id, channel, v, count(*)::BIGINT AS cnt
  FROM px GROUP BY doc_id, channel, v
),
modes AS (
  SELECT doc_id, channel, v AS mode_v, cnt AS mode_count
  FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, channel
                                 ORDER BY cnt DESC, v) AS rn
    FROM hist)
  WHERE rn = 1
),
agg AS (
  SELECT doc_id, channel, sum(cnt)::BIGINT AS n_px,
         count(*)::BIGINT AS n_distinct,
         sum(cnt * cnt)::BIGINT AS sq
  FROM hist GROUP BY doc_id, channel
)
SELECT a.doc_id AS media_id, a.channel::BIGINT AS channel, a.n_px,
       a.n_distinct, m.mode_v::BIGINT AS mode_v, m.mode_count,
       CAST(1000000 - (1000000 * a.sq) // (a.n_px * a.n_px) AS BIGINT)
         AS gini_e6
FROM agg a JOIN modes m USING (doc_id, channel)
ORDER BY media_id, channel"""


# ---------------------------------------------------------------------------
# x41 — top-p nucleus coverage per language
# ---------------------------------------------------------------------------


def x41_nucleus_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Nucleus (top-p = 0.8) vocabulary size and exact covered mass per
    language — text/nucleus.py."""
    from bioeco_portal_etl_spark.text.nucleus import nucleus_coverage

    d = T(spark, sf, "documents").select(
        F.coalesce("lang", F.lit("und")).alias("lang"), "text"
    )
    return nucleus_coverage(d, "lang", "text", p_e6=800_000).orderBy("grp")


def _x41_sql() -> str:
    from bioeco_portal_etl_spark.text.nucleus import duck_nucleus_coverage

    body = duck_nucleus_coverage(
        "SELECT coalesce(lang, 'und') AS lang, text FROM documents",
        "lang",
        p_e6=800_000,
    )
    return f"""
WITH {body}
SELECT grp, n_vocab, total_tokens, n_nucleus, nucleus_mass_e6
FROM nuc ORDER BY grp"""


CATALOG_EXT22 = {
    "tx34_ngram_novelty": (tx34_ngram_novelty, _tx34_sql()),
    "x40_skyline_2d": (x40_skyline_2d, _x40_sql()),
    "gr18_clustering_coeff": (gr18_clustering_coeff, _gr18_sql()),
    "mm16_pixel_gini": (mm16_pixel_gini, _mm16_sql()),
    "x41_nucleus_coverage": (x41_nucleus_coverage, _x41_sql()),
}
