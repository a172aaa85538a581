"""Catalog extension 17 — round-5 fourteenth batch.

- rel31_bom_rollup: bill-of-materials explosion
  (operators/hierarchy.py bom_rollup) — per-root effective quantities
  under the multiplicative path semiring (flatten_hierarchy walks
  pointers; this walks QUANTITIES), fixed-depth parent-chain unroll;
- mm12_resize_pixels: full decode -> nearest-neighbor resample ->
  re-encode -> decode chain through the REAL PNG codec
  (multimodal/media.py resize_media + png_channel_stats), verified by
  per-channel stats of the THUMBNAIL pixels against the pure-arithmetic
  resample formula;
- x35_market_basket: association rules (operators/basket.py) — support/
  confidence/lift over co-purchased item classes, pair generation
  bounded by basket size, e6 integer metrics;
- tx31_doc_cosine: sparse document-document cosine via the inverted-
  index self-join (text/doccosine.py) — squared-cosine e6 keeps the
  whole surface integer (no sqrt), max_df bounds the per-term fan-out
  exactly like td10's prefix filter;
- x36_time_weighted_avg: duration-weighted means for irregularly
  sampled state (operators/timeseries.py time_weighted_avg) — step-
  interpolated holding times from one lead() window, integer
  cent-seconds, rolled up per day.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# rel31 — BOM quantity rollup
# ---------------------------------------------------------------------------

_BOM_FANOUT = 8  # parent = partkey // 8 -> depth ~ log8(|part|)


def rel31_bom_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Synthetic assembly forest over part (parent = p_partkey // 8,
    qty = p_partkey % 3 + 1): per-root component census — n_parts,
    total and max effective quantity (operators/hierarchy.py
    bom_rollup, 8-level unroll)."""
    from bioeco_portal_etl_spark.operators.hierarchy import bom_rollup

    p = T(spark, sf, "part").select(
        F.col("p_partkey").alias("node"),
        F.when(
            F.col("p_partkey") < _BOM_FANOUT, F.lit(None).cast("long")
        )
        .otherwise(F.expr(f"p_partkey div {_BOM_FANOUT}"))
        .alias("parent"),
        (F.col("p_partkey") % 3 + 1).cast("long").alias("qty"),
    )
    return (
        bom_rollup(p, max_depth=8)
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("eff_qty").cast("long").alias("sum_eff_qty"),
            F.max("eff_qty").cast("long").alias("max_eff_qty"),
        )
        .orderBy("root")
    )


def _rel31_sql() -> str:
    f = _BOM_FANOUT
    parts = [
        f"""__bom_up AS MATERIALIZED (
  SELECT p_partkey AS u_node,
         CASE WHEN p_partkey < {f} THEN NULL
              ELSE p_partkey // {f} END AS u_parent,
         p_partkey % 3 + 1 AS u_qty
  FROM part
)""",
        f"""__bom_s0 AS MATERIALIZED (
  SELECT u_node AS node, u_parent AS anc, u_node AS root,
         CASE WHEN u_parent IS NULL THEN 1 ELSE u_qty END AS eff_qty
  FROM __bom_up
)""",
    ]
    for i in range(8):
        parts.append(
            f"""__bom_s{i + 1} AS MATERIALIZED (
  SELECT s.node,
         CASE WHEN s.anc IS NOT NULL AND u.u_parent IS NOT NULL
              THEN u.u_parent END AS anc,
         CASE WHEN s.anc IS NOT NULL AND u.u_parent IS NULL
              THEN s.anc ELSE s.root END AS root,
         CASE WHEN s.anc IS NOT NULL AND u.u_parent IS NOT NULL
              THEN s.eff_qty * u.u_qty ELSE s.eff_qty END AS eff_qty
  FROM __bom_s{i} s LEFT JOIN __bom_up u ON u.u_node = s.anc
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT root, count(*)::BIGINT AS n_parts,
       sum(eff_qty)::BIGINT AS sum_eff_qty,
       max(eff_qty)::BIGINT AS max_eff_qty
FROM __bom_s8 GROUP BY root ORDER BY root"""


# ---------------------------------------------------------------------------
# mm12 — real pixel resize round-trip
# ---------------------------------------------------------------------------

_MM12_MAX_DIM = 5


def mm12_resize_pixels(spark: SparkSession, sf: str) -> DataFrame:
    """Decode -> nearest-neighbor downsample (aspect-preserving, integer
    source indexing) -> PNG re-encode -> decode again, proven by
    per-channel stats of the THUMBNAIL pixels: the full image-transform
    loop a thumbnailing pipeline runs, all through the real stdlib
    codec. The oracle recomputes every resampled pixel from the source
    formula + the same integer index map."""
    from bioeco_portal_etl_spark.multimodal.media import (
        decode_image,
        png_channel_stats,
        resize_media,
        synth_rgb_png,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id", (F.col("doc_id") % 16).alias("seed"))
        .filter(F.col("doc_id") < 200)
    )
    thumbs = resize_media(
        synth_rgb_png(ids, "doc_id", "seed"),
        max_dim=_MM12_MAX_DIM,
        decode_fn=decode_image,
    ).select("media_id", F.col("thumb").alias("payload"))
    return png_channel_stats(thumbs).orderBy("media_id", "channel")


def _mm12_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    m = _MM12_MAX_DIM
    return f"""
WITH ids AS (
  SELECT doc_id, doc_id % 16 AS seed FROM documents WHERE doc_id < 200
),
seeds AS (SELECT DISTINCT seed FROM ids),
dims AS (
  SELECT seed,
         {SYNTH_W_BASE} + seed % {SYNTH_W_MOD} AS w,
         {SYNTH_H_BASE} + seed % {SYNTH_H_MOD} AS h
  FROM seeds
),
-- resize_nearest geometry: max dim is always w here (w >= 8 > h <= 8),
-- scale = m / w, out_w = w*m//w = m, out_h = max(h*m//w, 1)
odims AS (
  SELECT seed, w, h, {m} AS out_w,
         greatest((h * {m}) // w, 1) AS out_h
  FROM dims
),
oxs AS (SELECT seed, w, h, out_w, out_h, unnest(range(0, out_w)) AS ox
        FROM odims),
oys AS (SELECT seed, w, h, out_w, out_h, ox, unnest(range(0, out_h)) AS oy
        FROM oxs),
cs AS (SELECT seed, w, h, out_w, out_h, ox, oy, unnest([0, 1, 2]) AS c
       FROM oys),
px AS (
  SELECT seed, c AS channel,
         (seed * 7 + ((ox * w) // out_w) * 3
          + ((oy * h) // out_h) * 5 + c * 11) % 256 AS v
  FROM cs
),
st AS (
  SELECT seed, channel, count(*) AS n_px,
         sum(v) // count(*) AS mean_v, min(v) AS min_v, max(v) AS max_v
  FROM px GROUP BY seed, channel
)
SELECT ids.doc_id AS media_id, st.channel,
       st.n_px::BIGINT AS n_px, st.mean_v::BIGINT AS mean_v,
       st.min_v::BIGINT AS min_v, st.max_v::BIGINT AS max_v
FROM ids JOIN st ON st.seed = ids.seed
ORDER BY media_id, channel"""


# ---------------------------------------------------------------------------
# x35 — market-basket association rules
# ---------------------------------------------------------------------------


def x35_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Association rules over order baskets with items = part class
    (l_partkey % 40): support / confidence / lift in e6 integers,
    RELATIVE min support 1/200 of baskets with an absolute floor of 2
    (operators/basket.py). The round-8 sf0.001 sweep caught the
    original absolute min_support=50 returning zero pairs at 1.5k
    baskets (max pair support 28) while cutting NOTHING at >= 14k
    baskets — an absolute support cut is scale-dependent in both
    directions; the basket-fraction form is the textbook one."""
    from bioeco_portal_etl_spark.operators.basket import association_rules

    li = T(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("basket"),
        (F.col("l_partkey") % 40).cast("long").alias("item"),
    )
    return association_rules(
        li, "basket", "item", min_support=2, min_support_per=200
    ).orderBy("item_a", "item_b")


def _x35_sql() -> str:
    from bioeco_portal_etl_spark.operators.basket import duck_association_rules

    body = duck_association_rules(
        "SELECT l_orderkey AS basket,"
        " CAST(l_partkey % 40 AS BIGINT) AS item FROM lineitem",
        min_support=2,
        min_support_per=200,
    )
    return f"""
WITH {body}
SELECT item_a, item_b, support_ab, support_a, support_b,
       conf_ab_e6, conf_ba_e6, lift_e6
FROM rules ORDER BY item_a, item_b"""


# ---------------------------------------------------------------------------
# tx31 — sparse doc-doc cosine via postings self-join
# ---------------------------------------------------------------------------


def tx31_doc_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Squared-cosine document pairs (e6) over rare 3-word SHINGLES
    (df <= 20) for doc_id < 300, threshold cos2 >= 1000 —
    text/doccosine.py.

    Round-6 retune (VERDICT r5 #1): the synthetic corpus has a ~24-word
    closed vocabulary, so every UNIGRAM is stopword-frequent and the
    original df<=20 cut left ZERO pairs at every SF — the gate entry
    hash-matched 0 rows against 0 rows. 3-word shingles restore a real
    rare tail (sf0.01: 4.5k df=2 shingles, none above df=20), giving a
    392-row deterministic gate set."""
    from bioeco_portal_etl_spark.text.doccosine import (
        doc_cosine2_pairs,
        term_counts,
    )

    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    tc = term_counts(d, "doc_id", "text", shingle_k=3)
    return doc_cosine2_pairs(tc, max_df=20, min_cos2_e6=1000).orderBy(
        "doc_a", "doc_b"
    )


def _tx31_sql() -> str:
    from bioeco_portal_etl_spark.text.doccosine import duck_doc_cosine2

    body = duck_doc_cosine2(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300",
        max_df=20,
        min_cos2_e6=1000,
        shingle_k=3,
    )
    return f"""
WITH {body}
SELECT doc_a, doc_b, dot, cos2_e6 FROM dcos ORDER BY doc_a, doc_b"""


# ---------------------------------------------------------------------------
# x36 — time-weighted average
# ---------------------------------------------------------------------------


def x36_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(user, day) duration-weighted mean event value (step
    interpolation, integer cent-seconds), rolled up per day: n_series,
    total holding seconds, and the day's mean TWA — operators/
    timeseries.py time_weighted_avg."""
    from bioeco_portal_etl_spark.operators.timeseries import time_weighted_avg

    ev = T(spark, sf, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    twa = time_weighted_avg(ev, ["user_id", "day"], "ts", "value").filter(
        F.col("span_secs") > 0
    )
    return (
        twa.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_series"),
            F.sum("span_secs").cast("long").alias("sum_span_secs"),
            F.expr("CAST(sum(twa_e4) div count(1) AS BIGINT)").alias(
                "mean_twa_e4"
            ),
        )
        .orderBy("day")
    )


X36_SQL = """
WITH ev AS (
  SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day, ts,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
stepped AS (
  SELECT user_id, day, cents,
         (epoch_us(lead(ts) OVER (PARTITION BY user_id, day ORDER BY ts))
          - epoch_us(ts)) // 1000000 AS hold
  FROM ev
),
twa AS (
  SELECT user_id, day,
         sum(hold) AS span_secs,
         CAST(CASE WHEN sum(hold) > 0 THEN
              (10000 * sum(cents * hold)) // sum(hold) END AS BIGINT)
           AS twa_e4
  FROM stepped WHERE hold IS NOT NULL
  GROUP BY user_id, day
)
SELECT day, count(*)::BIGINT AS n_series,
       sum(span_secs)::BIGINT AS sum_span_secs,
       CAST(sum(twa_e4) // count(*) AS BIGINT) AS mean_twa_e4
FROM twa WHERE span_secs > 0
GROUP BY day ORDER BY day"""


CATALOG_EXT17 = {
    "rel31_bom_rollup": (rel31_bom_rollup, _rel31_sql()),
    "mm12_resize_pixels": (mm12_resize_pixels, _mm12_sql()),
    "x35_market_basket": (x35_market_basket, _x35_sql()),
    "tx31_doc_cosine": (tx31_doc_cosine, _tx31_sql()),
    "x36_time_weighted_avg": (x36_time_weighted_avg, X36_SQL),
}
