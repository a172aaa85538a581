"""Catalog extension 16 — round-5 thirteenth batch.

- gr13_personalized_pagerank: topic-sensitive / personalized PageRank
  (graph/pagerank.py personalized_pagerank) — teleport mass returns to
  the SEED set only, ranking nodes by proximity to the seeds; same e9
  integer fixed-point as gr1;
- dq10_l_diversity: l-diversity privacy audit
  (operators/anonymity.py l_diversity_audit) — k-anonymity's missing
  half: groups whose sensitive attribute is (near-)uniform disclose it
  without re-identification; distinct-l + max-share, count-only integer
  arithmetic;
- sk8_hist_merge_quantiles: mergeable fixed-bin histogram quantiles
  with an exactness certificate (sketches/histq.py) — day-grain
  histograms merged to global by bin addition, p50/p90 read from the
  merged sketch, certified against the EXACT nearest-rank quantiles
  (contained-in-bin flags both engines compute);
- x34_selectivity_audit: 2-D grid-histogram cardinality estimation
  (operators/selectivity.py) — est_lo/est_hi brackets from a multi-
  column histogram vs ACTUAL row counts for three predicate rectangles:
  the optimizer-statistics loop (x32 diagnoses skew, x33 prunes files,
  x34 estimates cardinality);
- w18_stream_cms_topk: LIVE per-window Count-Min frequency estimates
  with bounded state (streaming/windows.py windowed_cms_grid) — d*w =
  1024 counter rows per window regardless of key cardinality; the
  drained grids are probed read-side for a fixed candidate set.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr13 — personalized PageRank
# ---------------------------------------------------------------------------


def gr13_personalized_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PPR from the gr3 seed suppliers (s_suppkey % 17 = 0) over the
    supplier chain graph, 3 supersteps — nodes ranked by proximity to
    the seeds; zero-mass nodes are filtered (they are 'unreachable in 3
    damped steps', not rank-0 peers)."""
    from bioeco_portal_etl_spark.graph.pagerank import personalized_pagerank

    from bioeco_portal_etl_spark.catalog_ext2 import _chain_supplier_edges

    edges = _chain_supplier_edges(spark, sf)
    seeds = (
        T(spark, sf, "supplier")
        .filter(F.col("s_suppkey") % 17 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return (
        personalized_pagerank(edges, seeds, iterations=3)
        .filter(F.col("ppr_e9") > 0)
        .select("node", F.col("ppr_e9").cast("long").alias("ppr_e9"))
        .orderBy("node")
    )


def _gr13_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext2 import _CHAIN_EDGES_SQL
    from bioeco_portal_etl_spark.graph.pagerank import duck_ppr

    body = duck_ppr(
        _CHAIN_EDGES_SQL,
        "SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 17 = 0",
        iterations=3,
    )
    return f"""
WITH {body}
SELECT node, CAST(ppr_e9 AS BIGINT) AS ppr_e9 FROM ppr3
WHERE ppr_e9 > 0 ORDER BY node"""


# ---------------------------------------------------------------------------
# dq10 — l-diversity privacy audit
# ---------------------------------------------------------------------------


def dq10_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-2-diversity of order status within
    (o_orderpriority, order year) quasi-identifier groups, reported per
    priority: groups where every member shares ONE status are sensitive-
    attribute disclosures even when k-anonymity (dq5) passes."""
    from bioeco_portal_etl_spark.operators.anonymity import l_diversity_audit

    o = T(spark, sf, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").cast("long").alias("order_year"),
        "o_orderstatus",
    )
    return l_diversity_audit(
        o,
        ["o_orderpriority", "order_year"],
        "o_orderstatus",
        l=2,
        report_col="o_orderpriority",
    ).orderBy("o_orderpriority")


DQ10_SQL = """
WITH vc AS (
  SELECT o_orderpriority, year(o_orderdate) AS order_year, o_orderstatus,
         count(*) AS v_n
  FROM orders GROUP BY 1, 2, 3
),
g AS (
  SELECT o_orderpriority, order_year,
         sum(v_n) AS g_n, count(*) AS g_l, max(v_n) AS g_top
  FROM vc GROUP BY 1, 2
)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_groups,
       sum(g_n)::BIGINT AS n_records,
       sum(CASE WHEN g_l < 2 THEN 1 ELSE 0 END)::BIGINT AS n_risky_groups,
       sum(CASE WHEN g_l < 2 THEN g_n ELSE 0 END)::BIGINT AS n_risky_records,
       min(g_l)::BIGINT AS min_l,
       max((1000000 * g_top) // g_n)::BIGINT AS max_share_e6
FROM g GROUP BY o_orderpriority ORDER BY o_orderpriority"""


# ---------------------------------------------------------------------------
# sk8 — mergeable histogram quantiles, certified against exact
# ---------------------------------------------------------------------------

_SK8_BINS, _SK8_LO, _SK8_STEP = 16, 0, 3200
_SK8_PCTS = [("p50", 2, 1), ("p90", 10, 9)]


def sk8_hist_merge_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Day-grain value histograms merged to a global sketch by bin
    addition, p50/p90 read from the merged bins, then CERTIFIED against
    the exact nearest-rank quantiles: contained flags must be 1 (the
    exact value's clamped bin equals the estimated bin) — sketches/
    histq.py. One output row."""
    from bioeco_portal_etl_spark.sketches.histq import (
        binned_histogram,
        exact_quantiles_cents,
        hist_quantiles,
        merge_histograms,
    )

    ev = T(spark, sf, "events").select(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        "value",
    )
    day_hist = binned_histogram(
        ev, ["day"], "value", _SK8_BINS, _SK8_LO, _SK8_STEP
    )
    merged = merge_histograms(day_hist, [])
    est = hist_quantiles(merged, [], _SK8_PCTS, _SK8_LO, _SK8_STEP)
    exact = exact_quantiles_cents(ev, [], "value", _SK8_PCTS)

    def clamp_bin(c: F.Column) -> F.Column:
        return F.least(
            F.greatest(
                F.floor((c - F.lit(_SK8_LO)) / F.lit(_SK8_STEP)).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(_SK8_BINS - 1).cast("long"),
        )

    out = est.crossJoin(F.broadcast(exact))
    cols = [F.col("n").cast("long").alias("n")]
    for name, _, _ in _SK8_PCTS:
        cols += [
            F.col(f"{name}_bin").cast("long").alias(f"{name}_bin"),
            F.col(f"{name}_est_cents").cast("long").alias(f"{name}_est_cents"),
            F.col(f"{name}_exact_cents")
            .cast("long")
            .alias(f"{name}_exact_cents"),
            (clamp_bin(F.col(f"{name}_exact_cents")) == F.col(f"{name}_bin"))
            .cast("long")
            .alias(f"{name}_contained"),
        ]
    return out.select(*cols).orderBy("n")


def _sk8_sql() -> str:
    bins, lo, step = _SK8_BINS, _SK8_LO, _SK8_STEP
    return f"""
WITH vals AS (
  SELECT time_bucket(INTERVAL '1 day', ts) AS day,
         CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
day_hist AS (
  SELECT day,
         least(greatest(CAST(floor((v - {lo}) / {step}) AS BIGINT), 0),
               {bins - 1}) AS bin,
         count(*) AS cnt
  FROM vals GROUP BY day, bin
),
merged AS (SELECT bin, sum(cnt)::BIGINT AS cnt FROM day_hist GROUP BY bin),
cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         sum(cnt) OVER () AS n
  FROM merged
),
est AS (
  SELECT max(n)::BIGINT AS n,
         min(CASE WHEN 2 * cum - 1 * n >= 0 THEN bin END)::BIGINT AS p50_bin,
         min(CASE WHEN 10 * cum - 9 * n >= 0 THEN bin END)::BIGINT AS p90_bin
  FROM cum
),
freq AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
fcum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM freq
),
exact AS (
  SELECT min(CASE WHEN 2 * cum - 1 * n >= 0 THEN v END)::BIGINT
           AS p50_exact_cents,
         min(CASE WHEN 10 * cum - 9 * n >= 0 THEN v END)::BIGINT
           AS p90_exact_cents
  FROM fcum
)
SELECT n,
       p50_bin, ({lo} + p50_bin * {step})::BIGINT AS p50_est_cents,
       p50_exact_cents,
       CASE WHEN least(greatest(CAST(floor((p50_exact_cents - {lo}) / {step})
                                     AS BIGINT), 0), {bins - 1}) = p50_bin
            THEN 1 ELSE 0 END::BIGINT AS p50_contained,
       p90_bin, ({lo} + p90_bin * {step})::BIGINT AS p90_est_cents,
       p90_exact_cents,
       CASE WHEN least(greatest(CAST(floor((p90_exact_cents - {lo}) / {step})
                                     AS BIGINT), 0), {bins - 1}) = p90_bin
            THEN 1 ELSE 0 END::BIGINT AS p90_contained
FROM est CROSS JOIN exact
ORDER BY n"""


# ---------------------------------------------------------------------------
# x34 — 2-D histogram cardinality estimation audit
# ---------------------------------------------------------------------------

_X34_A_STEP, _X34_B_STEP = 64, 16
_X34_PREDICATES = [
    # cell-aligned rectangle: the grid proves it exactly (lo = hi = actual)
    ("aligned", 128, 191, 2000, 2159),
    # unaligned: boundary cells open the lo/hi bracket
    ("unaligned", 100, 199, 2000, 2179),
    # everything: both bounds collapse to the full row count
    ("all_rows", 0, 10_000_000, 0, 10_000_000),
]


def x34_selectivity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Cardinality-estimation audit over the (o_custkey, order_day) 2-D
    grid histogram: est_lo/est_hi brackets per predicate rectangle next
    to the ACTUAL row count, plus bracket_ok (the containment the
    operator guarantees) — operators/selectivity.py."""
    from bioeco_portal_etl_spark.operators.selectivity import (
        grid_histogram_2d,
        selectivity_bounds,
    )

    o = T(spark, sf, "orders").select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.expr("datediff(o_orderdate, DATE '1992-01-01')")
        .cast("long")
        .alias("order_day"),
    )
    grid = grid_histogram_2d(o, "o_custkey", "order_day", _X34_A_STEP, _X34_B_STEP)
    bounds = selectivity_bounds(grid, _X34_A_STEP, _X34_B_STEP, _X34_PREDICATES)
    actual = o.agg(
        *[
            F.sum(
                (
                    F.col("o_custkey").between(a_lo, a_hi)
                    & F.col("order_day").between(b_lo, b_hi)
                ).cast("long")
            ).alias(name)
            for name, a_lo, a_hi, b_lo, b_hi in _X34_PREDICATES
        ]
    )
    melted = actual.selectExpr(
        "stack({n}, {args}) AS (predicate, actual_rows)".format(
            n=len(_X34_PREDICATES),
            args=", ".join(
                f"'{name}', {name}" for name, *_ in _X34_PREDICATES
            ),
        )
    )
    return (
        bounds.join(F.broadcast(melted), "predicate")
        .select(
            "predicate",
            F.col("est_lo").cast("long").alias("est_lo"),
            F.col("est_hi").cast("long").alias("est_hi"),
            F.col("cells_full").cast("long").alias("cells_full"),
            F.col("cells_partial").cast("long").alias("cells_partial"),
            F.col("actual_rows").cast("long").alias("actual_rows"),
            (
                (F.col("est_lo") <= F.col("actual_rows"))
                & (F.col("actual_rows") <= F.col("est_hi"))
            )
            .cast("long")
            .alias("bracket_ok"),
        )
        .orderBy("predicate")
    )


def _x34_sql() -> str:
    from bioeco_portal_etl_spark.operators.selectivity import duck_selectivity

    body = duck_selectivity(
        """
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS order_day
  FROM orders""",
        "o_custkey",
        "order_day",
        _X34_A_STEP,
        _X34_B_STEP,
        _X34_PREDICATES,
    )
    return f"""
WITH {body}
SELECT predicate, est_lo, est_hi, cells_full, cells_partial, actual_rows,
       CASE WHEN est_lo <= actual_rows AND actual_rows <= est_hi
            THEN 1 ELSE 0 END::BIGINT AS bracket_ok
FROM selest ORDER BY predicate"""


# ---------------------------------------------------------------------------
# w18 — streaming per-window CMS frequency estimates
# ---------------------------------------------------------------------------

_W18_D, _W18_W = 4, 256


def w18_stream_cms_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-window frequency estimates for a fixed candidate key set from
    a LIVE stream with bounded state: the stream maintains one Count-Min
    grid per hourly window (<= d*w = 1024 counter rows — never one row
    per key), drained availableNow in append mode; the drained grids are
    then probed read-side (min over d cells) for candidates
    user_id % 50 = 0. Estimates are bit-identical to batch cms_build on
    the same windows (same md5-permutation family)."""
    import os

    from bioeco_portal_etl_spark.sketches import h60
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions
    from bioeco_portal_etl_spark.streaming.windows import windowed_cms_grid
    from bioeco_portal_etl_spark.text.dedupe import MERSENNE31, PERM_A, PERM_B

    ev = T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
        .withWatermark("ts", "2 hours")
    )
    res = windowed_cms_grid(stream, "1 hour", "user_id", _W18_D, _W18_W).select(
        F.col("w.start").alias("window_start"), "row", "bucket", "cnt"
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            res.writeStream.format("memory")
            .queryName("w18_cms_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w18 stream did not drain")
    grid = spark.table("w18_cms_mem")

    # read-side probe: candidates x drained windows, min over the d cells
    cands = (
        ev.select(F.col("user_id").cast("long").alias("key"))
        .filter(F.col("key") % 50 == 0)
        .distinct()
    )
    h = F.col("__h")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (
                    (F.lit(PERM_A[j]) * (h % MERSENNE31) + F.lit(PERM_B[j]))
                    % MERSENNE31
                    % _W18_W
                ).alias("bucket"),
            )
            for j in range(_W18_D)
        ]
    )
    # the probe frame re-derives windows from the same drained grid the
    # left join reads (a self-join of the memory view) — project the
    # right side to fresh column names so the join condition never
    # references the same attribute from both sides
    probes = (
        cands.select("key", h60(F.col("key").cast("string")).alias("__h"))
        .select("key", F.explode(cells).alias("rb"))
        .select("key", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .crossJoin(grid.select("window_start").distinct())
    )
    g = grid.select(
        F.col("window_start").alias("g_ws"),
        F.col("row").alias("g_row"),
        F.col("bucket").alias("g_bucket"),
        F.col("cnt").alias("g_cnt"),
    )
    return (
        probes.join(
            F.broadcast(g),
            (F.col("window_start") == F.col("g_ws"))
            & (F.col("row") == F.col("g_row"))
            & (F.col("bucket") == F.col("g_bucket")),
            "left",
        )
        .groupBy("window_start", "key")
        .agg(
            F.min(F.coalesce(F.col("g_cnt"), F.lit(0)))
            .cast("long")
            .alias("est_cnt")
        )
        .orderBy("window_start", "key")
    )


def _w18_sql() -> str:
    from bioeco_portal_etl_spark.sketches import duck_h60
    from bioeco_portal_etl_spark.text.dedupe import MERSENNE31, PERM_A, PERM_B

    h = duck_h60("CAST(user_id AS VARCHAR)")
    hk = duck_h60("CAST(key AS VARCHAR)")
    build_rows = "\n  UNION ALL ".join(
        f"SELECT wstart, {j} AS row,"
        f" ({PERM_A[j]} * h + {PERM_B[j]}) % {MERSENNE31} % {_W18_W} AS bucket"
        f" FROM hashed"
        for j in range(_W18_D)
    )
    probe_rows = "\n  UNION ALL ".join(
        f"SELECT key, {j} AS row,"
        f" ({PERM_A[j]} * h + {PERM_B[j]}) % {MERSENNE31} % {_W18_W} AS bucket"
        f" FROM khashed"
        for j in range(_W18_D)
    )
    return f"""
WITH mx AS (SELECT max(ts) - INTERVAL '2 hours' AS wm FROM events),
complete AS (
  SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS wstart
  FROM events, mx
  WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' <= wm
),
hashed AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
         ({h}) % {MERSENNE31} AS h
  FROM events
  WHERE time_bucket(INTERVAL '1 hour', ts) IN (SELECT wstart FROM complete)
),
grid AS (
  SELECT wstart, row, bucket, count(*) AS cnt
  FROM ({build_rows}) GROUP BY wstart, row, bucket
),
cands AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS key FROM events
  WHERE user_id % 50 = 0
),
khashed AS (SELECT key, ({hk}) % {MERSENNE31} AS h FROM cands),
probes AS (
  SELECT p.key, p.row, p.bucket, c.wstart
  FROM ({probe_rows}) p CROSS JOIN complete c
)
SELECT p.wstart AS window_start, p.key,
       min(coalesce(g.cnt, 0))::BIGINT AS est_cnt
FROM probes p
LEFT JOIN grid g
  ON g.wstart = p.wstart AND g.row = p.row AND g.bucket = p.bucket
GROUP BY p.wstart, p.key
ORDER BY window_start, key"""


CATALOG_EXT16 = {
    "gr13_personalized_pagerank": (gr13_personalized_pagerank, _gr13_sql()),
    "dq10_l_diversity": (dq10_l_diversity, DQ10_SQL),
    "sk8_hist_merge_quantiles": (sk8_hist_merge_quantiles, _sk8_sql()),
    "x34_selectivity_audit": (x34_selectivity_audit, _x34_sql()),
    "w18_stream_cms_topk": (w18_stream_cms_topk, _w18_sql()),
}
