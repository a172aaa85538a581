"""Catalog extension 19 — round-5 sixteenth batch.

- gr15_effective_diameter: the neighborhood-function cutoff statistic
  from the gr11 HyperBall sketches (graph/hyperball.py
  effective_diameter) — smallest radius reaching 90% of reachable
  pairs, with the full auditable coverage curve;
- x38_ab_test: two-proportion experiment readout
  (operators/abtest.py) — per-variant conversion, lift, pooled z as
  floor-e4, integer significance gate at |z| >= 1.96;
- tx33_zipf_fit: corpus frequency-spectrum shape (text/zipf.py) —
  log-log OLS slope over the top-K terms with e4-quantized logs so the
  sufficient statistics sum as exact integers; top-K via
  TakeOrderedAndProject, never a vocabulary-wide sort;
- ts17_topk_diversity: intra-list diversity of the exact ts1 top-5
  (similarity/knn.py topk_diversity) — pairwise e4 similarity profile
  of each result set, the measurement side of the MMR re-ranker;
- dq11_expectations: declarative row-contract suite
  (operators/quality.py expectation_suite) — all rules evaluated in ONE
  scan, NULL-predicate-is-failure convention, pass_e6 per check.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr15 — effective diameter
# ---------------------------------------------------------------------------


def gr15_effective_diameter(spark: SparkSession, sf: str) -> DataFrame:
    """90% effective diameter of the supplier chain graph at probe
    radius 2, with the coverage curve (graph/hyperball.py
    effective_diameter over the gr11 sketches)."""
    from bioeco_portal_etl_spark.graph.hyperball import (
        effective_diameter,
        hyperball_neighborhood,
    )

    from bioeco_portal_etl_spark.catalog_ext2 import _chain_supplier_edges

    edges = _chain_supplier_edges(spark, sf)
    nodes = T(spark, sf, "supplier").select(F.col("s_suppkey").alias("node"))
    hb = hyperball_neighborhood(edges, nodes, radius=2)
    return effective_diameter(hb, radius=2).orderBy("eff_diameter")


def _gr15_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext2 import _CHAIN_EDGES_SQL
    from bioeco_portal_etl_spark.graph.hyperball import duck_hyperball

    return f"""
WITH {duck_hyperball(
        _CHAIN_EDGES_SQL,
        "SELECT s_suppkey AS node FROM supplier",
        2,
    )},
nr AS (SELECT r, sum(ball_est) AS n_pairs FROM hb GROUP BY r),
wide AS (
  SELECT max(CASE WHEN r = 0 THEN n_pairs END) AS n0,
         max(CASE WHEN r = 1 THEN n_pairs END) AS n1,
         max(CASE WHEN r = 2 THEN n_pairs END) AS n2
  FROM nr
)
SELECT CAST(CASE WHEN 10 * n0 - 9 * n2 >= 0 THEN 0
            WHEN 10 * n1 - 9 * n2 >= 0 THEN 1
            ELSE 2 END AS BIGINT) AS eff_diameter,
       CAST((1000000 * n0) // n2 AS BIGINT) AS coverage_e6_r0,
       CAST((1000000 * n1) // n2 AS BIGINT) AS coverage_e6_r1,
       CAST((1000000 * n2) // n2 AS BIGINT) AS coverage_e6_r2
FROM wide ORDER BY eff_diameter"""


# ---------------------------------------------------------------------------
# x38 — A/B test report
# ---------------------------------------------------------------------------


def x38_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user conversion experiment: variant = user parity, converted
    = user ever fired a purchase event; one-row two-proportion report
    (operators/abtest.py)."""
    from bioeco_portal_etl_spark.operators.abtest import ab_test_report

    users = (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("long")).alias(
                "converted"
            )
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("variant"),
            "converted",
        )
    )
    return ab_test_report(users, "variant", "converted").orderBy("n_a")


def _x38_sql() -> str:
    from bioeco_portal_etl_spark.operators.abtest import duck_ab_test

    body = duck_ab_test(
        """
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id"""
    )
    return f"""
WITH {body}
SELECT n_a, conv_a, rate_a_e6, n_b, conv_b, rate_b_e6, lift_e6, z_e4,
       significant
FROM ab ORDER BY n_a"""


# ---------------------------------------------------------------------------
# tx33 — Zipf fit
# ---------------------------------------------------------------------------

_ZIPF_K = 500


def tx33_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Log-log OLS slope of the corpus's top-500 term frequencies
    (text/zipf.py zipf_fit) — the vocabulary-shape QA number."""
    from bioeco_portal_etl_spark.text.zipf import zipf_fit

    return zipf_fit(
        T(spark, sf, "documents"), "text", top_k=_ZIPF_K
    ).orderBy("n_terms")


def _tx33_sql() -> str:
    from bioeco_portal_etl_spark.text.zipf import duck_zipf

    body = duck_zipf("SELECT text FROM documents", top_k=_ZIPF_K)
    return f"""
WITH {body}
SELECT n_terms, n_tokens, top1_share_e6, slope_e6
FROM zipf ORDER BY n_terms"""


# ---------------------------------------------------------------------------
# ts17 — top-k intra-list diversity
# ---------------------------------------------------------------------------


def ts17_topk_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise-similarity profile of each ts1 query's exact top-5
    (similarity/knn.py topk_diversity): C(5,2) = 10 pairs per query,
    mean/min/max e4 similarity."""
    from bioeco_portal_etl_spark.similarity.knn import topk_diversity

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_diversity(e, q, "embedding", "vec_id", k=5).orderBy(
        "query_id"
    )


def _ts17_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_COS, _DUCK_VEC

    return f"""
WITH {_DUCK_VEC},
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({_DUCK_COS}) * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id < 10) q
  JOIN n c ON q.vec_id <> c.vec_id
),
top AS (
  SELECT query_id, match_id, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM p)
  WHERE rank <= 5
),
pairs AS (
  SELECT a.query_id, a.match_id AS m_a, b.match_id AS m_b
  FROM top a JOIN top b
    ON a.query_id = b.query_id AND a.rank < b.rank
),
scored AS (
  SELECT pairs.query_id,
         floor((list_reduce(list_transform(range(1, 65),
                                           i -> q.e[i] * c.e[i]),
                            (a, b) -> a + b) / (q.nrm * c.nrm))
               * 10000)::BIGINT AS pair_sim_e4
  FROM pairs
  JOIN n q ON q.vec_id = pairs.m_a
  JOIN n c ON c.vec_id = pairs.m_b
)
SELECT query_id, count(*)::BIGINT AS n_pairs,
       CAST(sum(pair_sim_e4) // count(*) AS BIGINT) AS mean_pair_sim_e4,
       min(pair_sim_e4)::BIGINT AS min_pair_sim_e4,
       max(pair_sim_e4)::BIGINT AS max_pair_sim_e4
FROM scored GROUP BY query_id ORDER BY query_id"""


# ---------------------------------------------------------------------------
# dq11 — declarative expectations
# ---------------------------------------------------------------------------


def dq11_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Row-contract suite over orders, one scan: structural rules that
    must fully pass plus distribution rules that partially pass — the
    pass/fail gate a pipeline blocks on (operators/quality.py
    expectation_suite)."""
    from bioeco_portal_etl_spark.operators.quality import expectation_suite

    o = T(spark, sf, "orders")
    rules = [
        ("price_positive", F.col("o_totalprice") > 0),
        ("price_under_300k", F.col("o_totalprice") < 300000),
        (
            "priority_known",
            F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
        ),
        ("custkey_present", F.col("o_custkey").isNotNull()),
        (
            "date_in_range",
            F.col("o_orderdate").between("1992-01-01", "2003-12-31"),
        ),
    ]
    return expectation_suite(o, rules).orderBy("check")


DQ11_SQL = """
WITH agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS p_price_positive,
         sum(CASE WHEN o_totalprice < 300000 THEN 1 ELSE 0 END)
           AS p_price_under_300k,
         sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                                           '4-NOT SPECIFIED', '5-LOW')
                  THEN 1 ELSE 0 END) AS p_priority_known,
         sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
           AS p_custkey_present,
         sum(CASE WHEN CAST(o_orderdate AS DATE)
                       BETWEEN DATE '1992-01-01' AND DATE '2003-12-31'
                  THEN 1 ELSE 0 END) AS p_date_in_range
  FROM orders
),
stacked AS (
  SELECT 'price_positive' AS check_name, n, p_price_positive AS n_pass FROM agg
  UNION ALL
  SELECT 'price_under_300k', n, p_price_under_300k FROM agg
  UNION ALL
  SELECT 'priority_known', n, p_priority_known FROM agg
  UNION ALL
  SELECT 'custkey_present', n, p_custkey_present FROM agg
  UNION ALL
  SELECT 'date_in_range', n, p_date_in_range FROM agg
)
SELECT check_name AS "check", CAST(n AS BIGINT) AS n_rows,
       CAST(coalesce(n_pass, 0) AS BIGINT) AS n_pass,
       CAST(n - coalesce(n_pass, 0) AS BIGINT) AS n_fail,
       CASE WHEN n > 0
            THEN CAST((1000000 * n_pass) // n AS BIGINT) END AS pass_e6
FROM stacked ORDER BY "check" """


CATALOG_EXT19 = {
    "gr15_effective_diameter": (gr15_effective_diameter, _gr15_sql()),
    "x38_ab_test": (x38_ab_test, _x38_sql()),
    "tx33_zipf_fit": (tx33_zipf_fit, _tx33_sql()),
    "ts17_topk_diversity": (ts17_topk_diversity, _ts17_sql()),
    "dq11_expectations": (dq11_expectations, DQ11_SQL),
}
