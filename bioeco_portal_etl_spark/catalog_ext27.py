"""Round-6 catalog extensions, seventh batch — 5 entries:

- gr20_modularity: Newman modularity of the label-propagation
  communities (graph/modularity.py) — gr7's evaluation face, the same
  operator-plus-evaluator pairing as ts9/sk10;
- rel35_period_growth: month-over-month revenue growth via one lag
  window over the monthly rollup — the canonical reporting shape;
- ts22_centroid_drift: per-label squared centroid shift between two
  corpus halves (similarity/centroids.py label_centroid_drift) — the
  drift monitor ts19's stats feed;
- dq15_key_discovery: candidate-key uniqueness profiling
  (operators/quality.py key_discovery) — the schema-inference pass
  before choosing merge keys;
- x46_ndv_estimate_audit: Chao84 sample-based distinct-count estimation
  audited against the true NDV (operators/ndv.py) — the optimizer
  stats-collection question, measured.

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr20 — modularity of the LPA communities
# ---------------------------------------------------------------------------


def gr20_modularity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-community modularity contribution for the 20 largest
    label-propagation communities over the co-activity graph (the gr7
    pipeline re-scored by graph/modularity.py)."""
    from bioeco_portal_etl_spark.catalog_ext7 import _coactivity_edges
    from bioeco_portal_etl_spark.graph.labelprop import label_propagation
    from bioeco_portal_etl_spark.graph.modularity import community_modularity

    # the co-activity self-join is symmetric by construction (the <>
    # join emits both orderings); materialize it ONCE and share the
    # frame between the detector and the scorer — without this the
    # orders⋈orders join replays per consumer (10.0s -> 8.2s at sf0.1).
    # Round-12 layout (guide §2.4): dedupe via repartition("src") +
    # dropDuplicates instead of .distinct() — ONE exchange, and hash(src)
    # co-locates every (src, dst) group (subset-of-keys rule), so the
    # persisted frame is ALREADY the partitioning every downstream
    # aggregate keys on: LPA's per-round (node=src, label) counts, the
    # scorer's degree count, and the initial-label distinct all run
    # exchange-free, with the label table broadcast into the joins.
    sym = (
        _coactivity_edges(spark, sf)
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    labels = label_propagation(
        sym, rounds=2, pre_symmetrized=True, persist_edges=False
    )
    return community_modularity(
        sym, labels, top_k=20, pre_symmetrized=True
    ).orderBy(
        F.desc("n_nodes"), "community"
    )


def _gr20_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext7 import _COACT_EDGES_SQL
    from bioeco_portal_etl_spark.graph.labelprop import duck_label_propagation
    from bioeco_portal_etl_spark.graph.modularity import (
        duck_community_modularity,
    )

    lpa = duck_label_propagation(_COACT_EDGES_SQL, rounds=2)
    mod = duck_community_modularity(_COACT_EDGES_SQL, "l2", top_k=20)
    return f"""
WITH {lpa},
{mod}
SELECT community, n_nodes, internal_edges, degree_sum, q_contrib_e6
FROM modq ORDER BY n_nodes DESC, community"""


# ---------------------------------------------------------------------------
# rel35 — period-over-period growth
# ---------------------------------------------------------------------------


def rel35_period_growth(spark: SparkSession, sf: str) -> DataFrame:
    """(month, n_orders, rev_e2, prev_rev_e2, growth_e6): monthly
    revenue with the signed MoM growth — one combinable rollup + one
    lag window over the month table (dimension-sized)."""
    o = T(spark, sf, "orders").select(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias(
            "month"
        ),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("p_e2"),
    )
    from pyspark.sql import Window

    monthly = o.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("p_e2").cast("long").alias("rev_e2"),
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_rev_e2", F.lag("rev_e2").over(w))
        .select(
            "month",
            "n_orders",
            "rev_e2",
            F.col("prev_rev_e2").cast("long").alias("prev_rev_e2"),
            F.expr(
                "CASE WHEN prev_rev_e2 > 0 THEN"
                " CAST(floor(CAST(1000000 * (rev_e2 - prev_rev_e2)"
                " AS DOUBLE) / prev_rev_e2) AS BIGINT) END"
            ).alias("growth_e6"),
        )
        .orderBy("month")
    )


def _rel35_sql() -> str:
    return """
WITH monthly AS (
  SELECT time_bucket(INTERVAL '1 month', CAST(o_orderdate AS TIMESTAMP))
           AS month,
         count(*)::BIGINT AS n_orders,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_e2
  FROM orders GROUP BY 1
)
SELECT month, n_orders, rev_e2,
       lag(rev_e2) OVER (ORDER BY month) AS prev_rev_e2,
       CASE WHEN lag(rev_e2) OVER (ORDER BY month) > 0 THEN
         CAST(floor(CAST(1000000 *
              (rev_e2 - lag(rev_e2) OVER (ORDER BY month)) AS DOUBLE)
              / lag(rev_e2) OVER (ORDER BY month)) AS BIGINT) END
         AS growth_e6
FROM monthly ORDER BY month"""


# ---------------------------------------------------------------------------
# ts22 — centroid drift between corpus halves
# ---------------------------------------------------------------------------


def ts22_centroid_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label squared L2 shift between the centroids of the even and
    odd vec_id halves — similarity/centroids.py label_centroid_drift."""
    from bioeco_portal_etl_spark.similarity.centroids import (
        label_centroid_drift,
    )

    e = T(spark, sf, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.when(F.col("vec_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("half"),
        "embedding",
    )
    return label_centroid_drift(e, "label", "embedding", "half").orderBy(
        "label"
    )


def _ts22_sql() -> str:
    from bioeco_portal_etl_spark.similarity.centroids import (
        duck_label_centroid_drift,
    )

    body = duck_label_centroid_drift(
        "SELECT CAST(label AS BIGINT) AS label,"
        " CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS half,"
        " embedding FROM embeddings",
        dims=64,
    )
    return f"""
WITH {body}
SELECT label, n_a, n_b, shift_q2 FROM cdrift ORDER BY label"""


# ---------------------------------------------------------------------------
# dq15 — candidate-key discovery
# ---------------------------------------------------------------------------

_KEY_CANDIDATES = [
    ["o_orderkey"],
    ["o_custkey"],
    ["o_custkey", "o_orderdate"],
    ["o_orderstatus", "o_orderpriority"],
]


def dq15_key_discovery(spark: SparkSession, sf: str) -> DataFrame:
    """Uniqueness profile of four candidate key sets over orders —
    operators/quality.py key_discovery."""
    from bioeco_portal_etl_spark.operators.quality import key_discovery

    o = T(spark, sf, "orders")
    return key_discovery(o, _KEY_CANDIDATES).orderBy("candidate")


def _dq15_sql() -> str:
    from bioeco_portal_etl_spark.operators.quality import duck_key_discovery

    body = duck_key_discovery("SELECT * FROM orders", _KEY_CANDIDATES)
    return f"""
SELECT * FROM ({body}) ORDER BY candidate"""


# ---------------------------------------------------------------------------
# x46 — sample-based NDV estimation audit
# ---------------------------------------------------------------------------


def x46_ndv_estimate_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Chao84 NDV estimates from a deterministic 10% row sample vs true
    distinct counts for l_partkey / l_suppkey — operators/ndv.py."""
    from bioeco_portal_etl_spark.operators.ndv import ndv_estimate_audit

    li = T(spark, sf, "lineitem")
    row_key = F.concat_ws(":", "l_orderkey", "l_linenumber")
    return ndv_estimate_audit(
        li, row_key, ["l_partkey", "l_suppkey"], sample_buckets=1000
    ).orderBy("column_name")


def _x46_sql() -> str:
    from bioeco_portal_etl_spark.operators.ndv import duck_ndv_estimate_audit

    body = duck_ndv_estimate_audit(
        "SELECT * FROM lineitem",
        "l_orderkey || ':' || l_linenumber",
        ["l_partkey", "l_suppkey"],
        sample_buckets=1000,
    )
    return f"""
SELECT * FROM ({body}) ORDER BY column_name"""


CATALOG_EXT27 = {
    "gr20_modularity": (gr20_modularity, _gr20_sql()),
    "rel35_period_growth": (rel35_period_growth, _rel35_sql()),
    "ts22_centroid_drift": (ts22_centroid_drift, _ts22_sql()),
    "dq15_key_discovery": (dq15_key_discovery, _dq15_sql()),
    "x46_ndv_estimate_audit": (x46_ndv_estimate_audit, _x46_sql()),
}
