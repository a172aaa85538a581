"""Round-5 catalog extensions, tenth batch — 5 entries:

- rel29_grouping_sets: GROUPING SETS with grouping_id — the general form
  that rel1's ROLLUP and rel9's CUBE are sugar for, Spark 4's
  DataFrame.groupingSets API vs DuckDB's GROUP BY GROUPING SETS;
- sk7_hll_merge: HLL sketch MERGEABILITY proven under the hash gate —
  per-day register sketches rolled up by pointwise max into weekly and
  global estimates that must equal sketching the coarser grain directly
  (the reaggregation property that makes sketches viable at 100 TB);
- tx29_ngram_coverage: cross-document repeated n-gram coverage (Lee et
  al. 2022) — the sub-document span-reuse diagnostic document-level
  dedup cannot see (text/ngram_coverage.py);
- ts15_ivf_balance: IVF index health report — per-cell population and
  corpus share, including empty cells (similarity/ivf.py
  ivf_cell_stats); the observability face of the ts3/ts4 index family;
- x32_join_skew_report: pre-join skew diagnosis — per-key counts on
  both sides and estimated join output, top-N hotspots (operators/
  skew.py join_skew_report); the report that justifies x1/x25 salting.

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
# rel29 — GROUPING SETS + grouping_id
# ---------------------------------------------------------------------------


def rel29_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Order counts and e2-floored revenue over the four grouping sets
    {(status, priority), (status), (priority), ()} in ONE aggregate pass
    (Spark expands sets with a single Expand node — one scan, not four);
    gid is grouping_id (bit per aggregated-away dim), labels coalesce to
    'ALL' (both dims are non-null in the data, so no value collision)."""
    o = T(spark, sf, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("__p_e2"),
    )
    s, p = F.col("o_orderstatus"), F.col("o_orderpriority")
    gs = (
        o.groupingSets([[s, p], [s], [p], []], s, p)
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("__p_e2").cast("long").alias("rev_e2"),
        )
    )
    return gs.select(
        "gid",
        F.coalesce(s, F.lit("ALL")).alias("status"),
        F.coalesce(p, F.lit("ALL")).alias("priority"),
        "n_orders",
        "rev_e2",
    ).orderBy("gid", "status", "priority")


REL29_SQL = """
SELECT grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid,
       coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_e2
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
ORDER BY gid, status, priority"""


# ---------------------------------------------------------------------------
# sk7 — HLL mergeability under the hash gate
# ---------------------------------------------------------------------------


def sk7_hll_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct active users per WEEK and overall, computed by MERGING
    per-day HLL register sketches (pointwise max — sketches/hll.py
    merge_registers), never re-reading raw data at the coarser grains.
    The oracle sketches each grain DIRECTLY: hash equality IS the proof
    that register-max merge is lossless — the property that lets a
    100 TB deployment keep daily sketches and answer any coarser
    distinct-count question from them."""
    from bioeco_portal_etl_spark.sketches.hll import (
        hll_estimate,
        hll_registers,
        merge_registers,
    )

    ev = T(spark, sf, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"), "user_id"
    )
    day_regs = hll_registers(ev, ["d"], "user_id")
    wk_regs = merge_registers(
        day_regs.withColumn("wk", F.to_date(F.date_trunc("week", F.col("d")))),
        ["wk"],
    )
    weekly = hll_estimate(wk_regs, ["wk"]).select(
        F.lit("week").alias("level"),
        F.col("wk").cast("string").alias("key"),
        "est_distinct",
    )
    all_regs = merge_registers(day_regs, [])
    overall = hll_estimate(all_regs, []).select(
        F.lit("all").alias("level"), F.lit("all").alias("key"), "est_distinct"
    )
    return weekly.unionByName(overall).orderBy("level", "key")


def _sk7_sql() -> str:
    from bioeco_portal_etl_spark.sketches.hll import duck_hll

    wk = duck_hll(
        "(SELECT date_trunc('week', ts::DATE) AS wk, user_id FROM events)",
        "wk",
        "user_id",
    )
    al = duck_hll("events", "'all'", "user_id")
    return f"""
SELECT * FROM (
  WITH {wk}
  SELECT 'week' AS level, grp::VARCHAR AS key, est_distinct FROM hll
)
UNION ALL
SELECT * FROM (
  WITH {al}
  SELECT 'all' AS level, grp AS key, est_distinct FROM hll
)
ORDER BY level, key"""


# ---------------------------------------------------------------------------
# tx29 — cross-document repeated n-gram coverage
# ---------------------------------------------------------------------------

_TX29_K, _TX29_MIN_DF = 3, 2


def tx29_ngram_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Per document: fraction of token positions covered by {k}-grams
    that appear in >= {m} distinct documents — the sub-document span-
    reuse diagnostic (boilerplate/template mass) document-level dedup
    cannot see (text/ngram_coverage.py)."""
    from bioeco_portal_etl_spark.text.ngram_coverage import ngram_coverage

    d = T(spark, sf, "documents").select("doc_id", "text")
    return ngram_coverage(
        d, "doc_id", "text", k=_TX29_K, min_df=_TX29_MIN_DF
    ).orderBy("doc_id")


tx29_ngram_coverage.__doc__ = tx29_ngram_coverage.__doc__.format(
    k=_TX29_K, m=_TX29_MIN_DF
)


def _tx29_sql() -> str:
    from bioeco_portal_etl_spark.text.ngram_coverage import (
        duck_ngram_coverage_sql,
    )

    ctes = duck_ngram_coverage_sql(
        "SELECT doc_id, text FROM documents",
        "doc_id",
        "text",
        k=_TX29_K,
        min_df=_TX29_MIN_DF,
    )
    return f"""
WITH {ctes.lstrip()}
SELECT doc_id, n_tokens, covered, coverage_e6 FROM ngcov ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# ts15 — IVF index balance report
# ---------------------------------------------------------------------------


def ts15_ivf_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Index health for the ts3 IVF layout (centroids = vec_id < 8):
    per-cell population and e6 corpus share, empty cells included — a
    skewed cell turns probes into scans, so maintenance jobs watch this
    to schedule centroid retraining (similarity/ivf.py ivf_cell_stats)."""
    from bioeco_portal_etl_spark.similarity.ivf import ivf_cell_stats

    e = T(spark, sf, "embeddings")
    return ivf_cell_stats(
        e, e.filter(F.col("vec_id") < 8), "embedding", "vec_id"
    ).orderBy("cell_id")


TS15_SQL = """
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
cent AS (SELECT vec_id AS cell_id, e, nrm FROM n WHERE vec_id < 8),
ca AS (
  SELECT x.vec_id AS cid, c.cell_id,
         floor(list_reduce(list_transform(range(1, 65),
                                          i -> x.e[i] * c.e[i]),
                           (a, b) -> a + b) / (x.nrm * c.nrm)
               * 10000)::BIGINT AS c_score
  FROM n x CROSS JOIN cent c
),
assigned AS (
  SELECT cid, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY cid
                                 ORDER BY c_score DESC, cell_id) AS rk
    FROM ca) WHERE rk = 1
),
counts AS (SELECT cell_id, count(*)::BIGINT AS n_vecs
           FROM assigned GROUP BY cell_id),
total AS (SELECT sum(n_vecs)::BIGINT AS N FROM counts)
SELECT c.cell_id, coalesce(k.n_vecs, 0)::BIGINT AS n_vecs,
       ((1000000 * coalesce(k.n_vecs, 0)) // t.N)::BIGINT AS share_e6
FROM cent c LEFT JOIN counts k USING (cell_id), total t
ORDER BY cell_id"""


# ---------------------------------------------------------------------------
# x32 — pre-join skew diagnosis
# ---------------------------------------------------------------------------


def x32_join_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Skew hotspots of the lineitem-lineitem co-purchase self-join on
    l_suppkey: per-key row counts and estimated join output, top 5 —
    the diagnosis that justifies the x1/x25 salting remedies and gr5's
    hub guard (operators/skew.py join_skew_report)."""
    from bioeco_portal_etl_spark.operators.skew import join_skew_report

    li = T(spark, sf, "lineitem").select("l_suppkey")
    return join_skew_report(li, li, "l_suppkey", top=5).orderBy("rank")


X32_SQL = """
WITH c AS (
  SELECT l_suppkey AS key, count(*)::BIGINT AS n FROM lineitem GROUP BY 1
)
SELECT key, n AS n_left, n AS n_right, (n * n)::BIGINT AS est_out,
       row_number() OVER (ORDER BY n * n DESC, key)::BIGINT AS rank
FROM c ORDER BY rank LIMIT 5"""


CATALOG_EXT13 = {
    "rel29_grouping_sets": (rel29_grouping_sets, REL29_SQL),
    "sk7_hll_merge": (sk7_hll_merge, _sk7_sql()),
    "tx29_ngram_coverage": (tx29_ngram_coverage, _tx29_sql()),
    "ts15_ivf_balance": (ts15_ivf_balance, TS15_SQL),
    "x32_join_skew_report": (x32_join_skew_report, X32_SQL),
}
