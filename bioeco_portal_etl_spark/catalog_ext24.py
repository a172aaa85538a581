"""Round-6 catalog extensions, fourth batch — 5 entries:

- rel33_max_concurrency: peak simultaneously-open intervals per event
  type via the +1/−1 sweep (operators/concurrency.py) — O(n log n)
  where the naive overlap self-join is quadratic;
- x43_weighted_median: per-group lower weighted median over the
  collapsed (group, value) weight table (operators/stats.py) — the
  frequency-table recipe, cross-multiplied integer rank selection;
- x44_join_card_estimate: the Selinger uniform-frequency join-size
  estimate audited against the exact size from per-key counts, without
  executing the join (operators/joinstats.py) — the optimizer-audit
  companion to x34's selectivity brackets;
- mm18_gain_normalization: per-clip loudness gain to a target RMS and
  would-clip counts through the real RIFF parse
  (multimodal/media.py wav_gain_normalization);
- tx36_langid_confusion: confusion matrix of the n-gram language
  identifier against the labeled language, with per-truth shares —
  the evaluation face of tx2.

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# rel33 — interval concurrency sweep
# ---------------------------------------------------------------------------


def rel33_max_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent synthetic sessions per event type: each event
    opens a [ts, ts + 60 + event_id % 240 s) interval —
    operators/concurrency.py max_concurrency in integer microseconds."""
    from bioeco_portal_etl_spark.operators.concurrency import max_concurrency

    ev = T(spark, sf, "events").select(
        F.col("event_type").alias("grp"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.lit(60) + F.col("event_id") % 240) * 1_000_000
        ).alias("end_us"),
        F.col("event_id").alias("tid"),
    )
    return max_concurrency(ev, "grp", "start_us", "end_us", "tid").orderBy(
        "grp"
    )


def _rel33_sql() -> str:
    from bioeco_portal_etl_spark.operators.concurrency import (
        duck_max_concurrency,
    )

    body = duck_max_concurrency(
        "SELECT event_type AS grp, epoch_us(ts) AS start_us,"
        " epoch_us(ts) + (60 + event_id % 240) * 1000000 AS end_us,"
        " event_id AS tid FROM events"
    )
    return f"""
WITH {body}
SELECT grp, n_intervals, max_concurrent, peak_at_us
FROM conc ORDER BY grp"""


# ---------------------------------------------------------------------------
# x43 — weighted median
# ---------------------------------------------------------------------------


def x43_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted median extended price (integer cents) per
    return flag — operators/stats.py weighted_median."""
    from bioeco_portal_etl_spark.operators.stats import weighted_median

    li = T(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice").cast("double") * 100)
        .cast("long")
        .alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_median(li, "grp", "price_c", "qty").orderBy("grp")


def _x43_sql() -> str:
    from bioeco_portal_etl_spark.operators.stats import duck_weighted_median

    body = duck_weighted_median(
        "SELECT l_returnflag AS grp,"
        " CAST(floor(l_extendedprice::DOUBLE * 100) AS BIGINT) AS v,"
        " CAST(l_quantity AS BIGINT) AS w FROM lineitem"
    )
    return f"""
WITH {body}
SELECT grp, total_weight, wmedian FROM wmed ORDER BY grp"""


# ---------------------------------------------------------------------------
# x44 — join-cardinality estimation audit
# ---------------------------------------------------------------------------


def x44_join_card_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Selinger estimate vs exact join size for two fact joins
    (orders⋈lineitem on orderkey, customer⋈orders on custkey) —
    operators/joinstats.py join_card_audit."""
    from bioeco_portal_etl_spark.operators.joinstats import join_card_audit

    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    c = T(spark, sf, "customer")
    a = join_card_audit(
        o.select(F.col("o_orderkey").alias("k")),
        li.select(F.col("l_orderkey").alias("k")),
        "k",
        "orders_lineitem",
    )
    b = join_card_audit(
        c.select(F.col("c_custkey").alias("k")),
        o.select(F.col("o_custkey").alias("k")),
        "k",
        "customer_orders",
    )
    return a.unionByName(b).orderBy("join_name")


def _x44_sql() -> str:
    from bioeco_portal_etl_spark.operators.joinstats import (
        duck_join_card_audit,
    )

    q1 = duck_join_card_audit(
        "SELECT o_orderkey AS k FROM orders",
        "SELECT l_orderkey AS k FROM lineitem",
        "k",
        "orders_lineitem",
    )
    q2 = duck_join_card_audit(
        "SELECT c_custkey AS k FROM customer",
        "SELECT o_custkey AS k FROM orders",
        "k",
        "customer_orders",
    )
    return f"""
SELECT * FROM ({q1}) UNION ALL SELECT * FROM ({q2}) ORDER BY join_name"""


# ---------------------------------------------------------------------------
# mm18 — loudness gain normalization
# ---------------------------------------------------------------------------


def mm18_gain_normalization(spark: SparkSession, sf: str) -> DataFrame:
    """Gain-to-target-RMS (e4) + would-clip counts for 100 synthetic
    PCM clips through the real RIFF round-trip
    (multimodal/media.py wav_gain_normalization, target RMS 500)."""
    from bioeco_portal_etl_spark.multimodal.media import (
        synth_pcm_wav,
        wav_gain_normalization,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 100)
    )
    return wav_gain_normalization(
        synth_pcm_wav(ids, "doc_id"), target_rms=500
    ).orderBy("media_id")


def _mm18_sql() -> str:
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
  SELECT doc_id, max(n)::BIGINT AS n, CAST(sum(s * s) AS BIGINT) AS energy
  FROM vals GROUP BY doc_id
),
gains AS (
  SELECT doc_id, n, energy,
         CASE WHEN energy > 0 THEN
           CAST(floor(10000 * 500 / sqrt(energy::DOUBLE / n)) AS BIGINT)
         END AS gain_e4
  FROM agg
)
SELECT g.doc_id AS media_id, g.n AS n_samples, g.energy, g.gain_e4,
       coalesce(sum(CASE WHEN abs(v.s) * g.gain_e4 > 32767 * 10000
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_clipped
FROM gains g JOIN vals v ON v.doc_id = g.doc_id
GROUP BY g.doc_id, g.n, g.energy, g.gain_e4
ORDER BY media_id"""


# ---------------------------------------------------------------------------
# tx36 — language-id confusion matrix
# ---------------------------------------------------------------------------


def tx36_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """(true_lang, pred_lang, n, share_of_true_e6): the n-gram language
    identifier (text/analysis.py language_id — tx2's operator) scored
    against the labeled lang column. The evaluation surface every
    classifier-shaped curation op needs next to its prediction op."""
    from bioeco_portal_etl_spark.text.analysis import language_id

    d = T(spark, sf, "documents").select(
        F.coalesce("lang", F.lit("und")).alias("true_lang"),
        language_id("text").alias("pred_lang"),
    )
    cell = d.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cell.groupBy("true_lang").agg(F.sum("n").alias("tn"))
    return (
        cell.join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST((1000000 * n) div tn AS BIGINT)").alias(
                "share_of_true_e6"
            ),
        )
        .orderBy("true_lang", "pred_lang")
    )


def _tx36_sql() -> str:
    # the tx2 oracle's langid mirror, aggregated to confusion cells
    pred = """CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
       WHEN s_es > 0 AND s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
       WHEN s_de > 0 AND s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
       ELSE 'und' END"""
    return f"""
WITH s AS (
  SELECT coalesce(lang, 'und') AS true_lang,
         len(regexp_extract_all(lower(text), '\\b(the|a|of|and|is|in|to)\\b')) AS s_en,
         len(regexp_extract_all(lower(text), '\\b(el|la|de|los|es|y|que)\\b')) AS s_es,
         len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|ein)\\b')) AS s_de,
         len(regexp_extract_all(lower(text), '\\b(le|la|les|des|est|et|une)\\b')) AS s_fr
  FROM documents
),
cell AS (
  SELECT true_lang, {pred} AS pred_lang, count(*)::BIGINT AS n
  FROM s GROUP BY true_lang, pred_lang
),
tot AS (SELECT true_lang, sum(n)::BIGINT AS tn FROM cell GROUP BY true_lang)
SELECT c.true_lang, c.pred_lang, c.n,
       CAST((1000000 * c.n) // t.tn AS BIGINT) AS share_of_true_e6
FROM cell c JOIN tot t USING (true_lang)
ORDER BY true_lang, pred_lang"""


CATALOG_EXT24 = {
    "rel33_max_concurrency": (rel33_max_concurrency, _rel33_sql()),
    "x43_weighted_median": (x43_weighted_median, _x43_sql()),
    "x44_join_card_estimate": (x44_join_card_estimate, _x44_sql()),
    "mm18_gain_normalization": (mm18_gain_normalization, _mm18_sql()),
    "tx36_langid_confusion": (tx36_langid_confusion, _tx36_sql()),
}
