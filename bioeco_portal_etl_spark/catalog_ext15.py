"""Catalog extension 15 — round-5 twelfth batch.

- tx30_textrank: TextRank keyword extraction (text/textrank.py) — ONE
  grouped integer PageRank over every document's word co-occurrence
  graph at once (doc_id rides the shuffle key; no per-doc driver loop),
  top-3 keywords per document;
- mm11_patch_dupes: cross-image duplicate detection by patch-level
  average-hash through the REAL PNG decode (multimodal/media.py
  patch_ahash) — finds visually-identical images whose bytes could
  differ, the multimodal analogue of text near-dup dedupe; duplicate
  groups are planted via synth_rgb_png's seed column and the oracle
  recomputes every fingerprint from the pixel formula in pure SQL;
- gr12_sssp: bounded-round multi-source weighted shortest paths
  (graph/sssp.py, Bellman-Ford relaxation) — "cheapest route using
  <= 3 edges" over the supplier chain graph with deterministic integer
  weights;
- x33_zone_skip: zone-map pruning audit (operators/zonemap.py) — per-
  file min/max statistics under a date-linear layout vs the x24 z-order
  layout, evaluated against three predicates: the quantitative
  files-skipped / rows-scanned case for an OPTIMIZE rewrite;
- w17_stream_binned_quantiles: LIVE streaming windowed p50/p90 with
  BOUNDED state (streaming/windows.py windowed_binned_quantiles) — a
  16-bin integer histogram per window via two chained streaming
  aggregates; quantiles are bin lower edges, so the state store holds
  <= 16 rows per window regardless of event volume.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# tx30 — TextRank keywords
# ---------------------------------------------------------------------------


def tx30_textrank(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TextRank keywords per document (doc_id < 120): grouped e9
    fixed-point PageRank over adjacent content-word pairs — 2 supersteps,
    each one equi-join + one partial-combinable sum keyed by
    (doc_id, word)."""
    from bioeco_portal_etl_spark.text.textrank import (
        cooccurrence_edges,
        textrank_keywords,
    )

    d = T(spark, sf, "documents").filter(F.col("doc_id") < 120)
    return textrank_keywords(
        cooccurrence_edges(d, "doc_id", "text"), iterations=2, k=3
    ).orderBy("doc_id", "rank")


def _tx30_sql() -> str:
    from bioeco_portal_etl_spark.text.textrank import duck_textrank

    body = duck_textrank(
        "SELECT doc_id, text FROM documents WHERE doc_id < 120",
        iterations=2,
        k=3,
    )
    return f"""
WITH {body}
SELECT doc_id, rank, word, pr_e9 FROM tr ORDER BY doc_id, rank"""


# ---------------------------------------------------------------------------
# mm11 — patch-hash duplicate image groups
# ---------------------------------------------------------------------------


def mm11_patch_dupes(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-image groups by patch-level average-hash: 240 synthetic
    PNGs seeded with doc_id % 16 (16 planted duplicate classes), hashed
    through the REAL decode (multimodal/media.py patch_ahash), grouped
    by (width, height, fingerprint). Only hash metadata is shuffled —
    payload bytes never leave the Arrow stage."""
    from bioeco_portal_etl_spark.multimodal.media import (
        patch_ahash,
        synth_rgb_png,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id", (F.col("doc_id") % 16).alias("seed"))
        .filter(F.col("doc_id") < 240)
    )
    hashed = patch_ahash(synth_rgb_png(ids, "doc_id", "seed"), patch=4)
    return (
        hashed.groupBy("width", "height", "fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("media_id").cast("long").alias("first_media"),
            F.max("media_id").cast("long").alias("last_media"),
        )
        .orderBy("width", "height", "fingerprint")
    )


def _mm11_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    return f"""
WITH ids AS (
  SELECT doc_id, doc_id % 16 AS seed FROM documents WHERE doc_id < 240
),
seeds AS (SELECT DISTINCT seed FROM ids),
dims AS (
  SELECT seed,
         {SYNTH_W_BASE} + seed % {SYNTH_W_MOD} AS w,
         {SYNTH_H_BASE} + seed % {SYNTH_H_MOD} AS h
  FROM seeds
),
xs AS (SELECT seed, w, h, unnest(range(0, w)) AS x FROM dims),
ys AS (SELECT seed, w, h, x, unnest(range(0, h)) AS y FROM xs),
cs AS (SELECT seed, w, h, x, y, unnest([0, 1, 2]) AS c FROM ys),
px AS (
  SELECT seed, w, h, x // 4 AS tx, y // 4 AS ty,
         (w + 3) // 4 AS nx,
         (seed * 7 + x * 3 + y * 5 + c * 11) % 256 AS v
  FROM cs
),
img AS (SELECT seed, sum(v) // count(*) AS img_mean FROM px GROUP BY seed),
tiles AS (
  SELECT seed, any_value(w) AS w, any_value(h) AS h, nx, ty, tx,
         sum(v) // count(*) AS tile_mean
  FROM px GROUP BY seed, nx, ty, tx
),
fp AS (
  SELECT t.seed, any_value(t.w) AS width, any_value(t.h) AS height,
         CAST(sum(CASE WHEN t.tile_mean >= i.img_mean
                       THEN CAST(1 AS BIGINT) << CAST(t.ty * t.nx + t.tx AS INT)
                       ELSE 0 END) AS BIGINT) AS fingerprint
  FROM tiles t JOIN img i ON i.seed = t.seed
  GROUP BY t.seed
)
SELECT fp.width, fp.height, fp.fingerprint,
       count(*)::BIGINT AS n_images,
       min(ids.doc_id)::BIGINT AS first_media,
       max(ids.doc_id)::BIGINT AS last_media
FROM ids JOIN fp ON fp.seed = ids.seed
GROUP BY fp.width, fp.height, fp.fingerprint
ORDER BY width, height, fingerprint"""


# ---------------------------------------------------------------------------
# gr12 — bounded-round weighted shortest paths
# ---------------------------------------------------------------------------


def gr12_sssp(spark: SparkSession, sf: str) -> DataFrame:
    """Cheapest <= 3-edge route cost from the gr3 seed suppliers
    (s_suppkey % 17 = 0) over the supplier chain graph, edge weight
    (src + dst) % 9 + 1 — multi-source Bellman-Ford, one equi-join +
    one MIN aggregate per round (graph/sssp.py)."""
    from bioeco_portal_etl_spark.graph.sssp import sssp_bounded

    from bioeco_portal_etl_spark.catalog_ext2 import _chain_supplier_edges

    edges = _chain_supplier_edges(spark, sf).withColumn(
        "w", (F.col("src") + F.col("dst")) % 9 + 1
    )
    seeds = (
        T(spark, sf, "supplier")
        .filter(F.col("s_suppkey") % 17 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return (
        sssp_bounded(edges, seeds, rounds=3)
        .select("node", F.col("dist").cast("long").alias("dist"))
        .orderBy("node")
    )


def _gr12_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext2 import _CHAIN_EDGES_SQL
    from bioeco_portal_etl_spark.graph.sssp import duck_sssp

    body = duck_sssp(
        f"SELECT src, dst, (src + dst) % 9 + 1 AS w"
        f" FROM ({_CHAIN_EDGES_SQL})",
        "SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 17 = 0",
        rounds=3,
    )
    return f"""
WITH {body}
SELECT node, CAST(dist AS BIGINT) AS dist FROM sssp ORDER BY node"""


# ---------------------------------------------------------------------------
# x33 — zone-map pruning audit (date-linear vs z-order layout)
# ---------------------------------------------------------------------------

_X33_PREDICATES = [
    ("cust_range", [("o_custkey", 100, 199)]),
    ("day_range", [("order_day", 2000, 2179)]),
    ("cust_and_day", [("o_custkey", 100, 199), ("order_day", 2000, 2179)]),
]


def x33_zone_skip(spark: SparkSession, sf: str) -> DataFrame:
    """File-skipping audit: per-file (min, max) zone maps of orders
    under (a) monthly date-range files and (b) the x24 z-order layout
    (z top-8 bits = file), each evaluated against three range
    predicates — files_skipped / rows_scanned per (layout, predicate)
    is the number an OPTIMIZE decision reads (operators/zonemap.py)."""
    from bioeco_portal_etl_spark.catalog_ext6 import (
        _Z_A_STEP,
        _Z_B_STEP,
        _Z_CAP,
    )
    from bioeco_portal_etl_spark.operators.zonemap import (
        skip_report,
        zone_maps,
    )
    from bioeco_portal_etl_spark.operators.zorder import quantize, z_expr

    o = T(spark, sf, "orders").select(
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1992-01-01')")
        .cast("long")
        .alias("order_day"),
    )
    coded = o.withColumn(
        "_za", quantize("o_custkey", _Z_A_STEP, _Z_CAP)
    ).withColumn("_zb", quantize("order_day", _Z_B_STEP, _Z_CAP))
    stat_cols = ["o_custkey", "order_day"]
    lin = skip_report(
        zone_maps(coded, F.expr("order_day div 30"), stat_cols),
        "date_linear",
        _X33_PREDICATES,
    )
    zor = skip_report(
        zone_maps(
            coded,
            F.shiftright(z_expr("_za", "_zb", 8), 8),
            stat_cols,
        ),
        "zorder",
        _X33_PREDICATES,
    )
    return lin.unionByName(zor).orderBy("layout", "predicate")


def _x33_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext6 import (
        _Z_A_STEP,
        _Z_B_STEP,
        _Z_CAP,
    )
    from bioeco_portal_etl_spark.operators.zonemap import duck_zone_skip
    from bioeco_portal_etl_spark.operators.zorder import z_expr_sql

    src = f"""
  SELECT o_custkey,
         CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS order_day,
         least(CAST(floor(o_custkey / {_Z_A_STEP}) AS BIGINT), {_Z_CAP}) AS za,
         least(CAST(floor(datediff('day', DATE '1992-01-01',
                                   CAST(o_orderdate AS DATE)) / {_Z_B_STEP})
                    AS BIGINT), {_Z_CAP}) AS zb
  FROM orders"""
    body = duck_zone_skip(
        src,
        [
            ("date_linear", "order_day // 30"),
            ("zorder", f"({z_expr_sql('za', 'zb', 8, 'duckdb')}) >> 8"),
        ],
        ["o_custkey", "order_day"],
        _X33_PREDICATES,
    )
    return f"""
WITH {body}
SELECT layout, predicate, files_total, files_skipped, rows_scanned
FROM zskip ORDER BY layout, predicate"""


# ---------------------------------------------------------------------------
# w17 — streaming windowed p50/p90 with bounded histogram state
# ---------------------------------------------------------------------------

_W17_BINS, _W17_LO, _W17_STEP = 16, 0, 3200


def w17_stream_binned_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly p50/p90 of event value from a LIVE stream with bounded
    state (<= 16 histogram rows per window): two chained streaming
    aggregates drained availableNow in append mode — a window emits once
    the 2 h watermark passes its end, so the result equals the batch
    histogram quantiles restricted to window_end <= max(ts) - 2h
    (exactly what the oracle computes)."""
    import os

    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.windows import (
        windowed_binned_quantiles,
    )

    T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(F.col("ts").cast("timestamp").alias("ts"), "value")
        .withWatermark("ts", "2 hours")
    )
    res = windowed_binned_quantiles(
        stream, "1 hour", "value", _W17_BINS, _W17_LO, _W17_STEP
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            res.writeStream.format("memory")
            .queryName("w17_binq_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w17 stream did not drain")
    return spark.table("w17_binq_mem").orderBy("window_start")


def _w17_sql() -> str:
    bins, lo, step = _W17_BINS, _W17_LO, _W17_STEP
    bcols = ",\n         ".join(
        f"sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END)::BIGINT AS b{i}"
        for i in range(bins)
    )

    def pick(mult_cum: int, mult_n: int) -> str:
        cases = []
        cum_terms = []
        for i in range(bins - 1):
            cum_terms.append(f"b{i}")
            cum = " + ".join(cum_terms)
            cases.append(
                f"WHEN {mult_cum} * ({cum}) - {mult_n} * n >= 0 THEN {i}"
            )
        return "CASE " + " ".join(cases) + f" ELSE {bins - 1} END"

    p50, p90 = pick(2, 1), pick(10, 9)
    return f"""
WITH mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events),
binned AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
         least(greatest(CAST(floor((CAST(floor(value * 100) AS BIGINT) - {lo})
                                   / {step}) AS BIGINT), 0), {bins - 1}) AS bin
  FROM events
),
hist AS (
  SELECT wstart, count(*)::BIGINT AS n,
         {bcols}
  FROM binned GROUP BY wstart
),
q AS (
  SELECT wstart, n,
         CAST({p50} AS BIGINT) AS p50_bin,
         CAST({p90} AS BIGINT) AS p90_bin
  FROM hist
)
SELECT wstart AS window_start, n,
       p50_bin, ({lo} + p50_bin * {step})::BIGINT AS p50_est_cents,
       p90_bin, ({lo} + p90_bin * {step})::BIGINT AS p90_est_cents
FROM q, mx WHERE wstart + INTERVAL '1 hour' <= wm
ORDER BY window_start"""


CATALOG_EXT15 = {
    "tx30_textrank": (tx30_textrank, _tx30_sql()),
    "mm11_patch_dupes": (mm11_patch_dupes, _mm11_sql()),
    "gr12_sssp": (gr12_sssp, _gr12_sql()),
    "x33_zone_skip": (x33_zone_skip, _x33_sql()),
    "w17_stream_binned_quantiles": (w17_stream_binned_quantiles, _w17_sql()),
}
