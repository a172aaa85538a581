"""Round-5 catalog extensions, fourth batch — 6 entries:

- tx22_bm25: BM25 ranked retrieval (text/bm25.py) — the Lucene-default
  lexical scorer with tf saturation + doc-length normalization; the
  scoring expression is ONE SQL string both engines evaluate verbatim,
  e4-floored per term before the per-doc sum;
- ts11_rrf_fusion: reciprocal-rank fusion (similarity/fusion.py) of the
  BM25 list with an exact-cosine list over the embeddings — the
  hybrid-retrieval combiner (pure integer rank arithmetic);
- gr7_label_communities: deterministic synchronous label propagation
  (graph/labelprop.py) over the same-day customer co-activity graph;
  community sizes, min-label tie-break;
- gr8_kcore: k-core peeling (graph/kcore.py) over the same graph —
  iterate delete-degree<k until fixpoint (localCheckpoint per round);
  the oracle unrolls 12 peels (no-ops after the fixpoint);
- dq7_profile_drift: whole-schema profile drift between the pre-/post-
  1995 order snapshots (operators/drift.py profile_drift) — null rate,
  cardinality, min/max/mean per column, exact DECIMAL mean;
- x25_salted_join: skew-salted equi-join (operators/skew.py salted_join)
  of a hot-keyed lineitem against the supplier dim — salt × explode
  replication, result provably identical to the plain join (the oracle
  IS the plain join).

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
# tx22 — BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "merge", "window"]


def tx22_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Top-100 documents for a 3-term query by BM25 (text/bm25.py):
    postings filtered in the scan stage, corpus stats and per-term
    document frequencies broadcast, per-term contributions e4-floored
    before the exact integer per-doc sum, distributed top-k."""
    from bioeco_portal_etl_spark.text.bm25 import bm25_topk

    docs = T(spark, sf, "documents")
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=100).orderBy(
        "rank"
    )


def _tx22_sql() -> str:
    from bioeco_portal_etl_spark.text.bm25 import duck_bm25_ctes

    return f"""
WITH {duck_bm25_ctes("text", "doc_id", "documents", _BM25_TERMS, k=100)}
SELECT doc_id, n_hit_terms, bm25_e4, rank FROM bm25r ORDER BY rank"""


# ---------------------------------------------------------------------------
# ts11 — reciprocal-rank fusion of BM25 + cosine lists
# ---------------------------------------------------------------------------

_RRF_QUERY_VEC = 7


def ts11_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-100 (lexical) fused with exact-cosine
    top-100 for query vector {qv} (semantic) by reciprocal-rank fusion
    (similarity/fusion.py) — score = Σ floor(1e6/(60+rank)), absent-list
    contribution 0. doc_id/vec_id share the synthetic id namespace, the
    usual hybrid-index layout."""
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk
    from bioeco_portal_etl_spark.similarity.fusion import rrf_fuse
    from bioeco_portal_etl_spark.text.bm25 import bm25_topk

    docs = T(spark, sf, "documents")
    emb = T(spark, sf, "embeddings")
    lex = bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=100)
    sem = cosine_topk(
        emb,
        emb.filter(F.col("vec_id") == _RRF_QUERY_VEC),
        "embedding",
        "vec_id",
        k=100,
    )
    return rrf_fuse(lex, sem, "doc_id", "match_id", k=50).orderBy("rank")


ts11_rrf_fusion.__doc__ = ts11_rrf_fusion.__doc__.format(qv=_RRF_QUERY_VEC)


def _ts11_sql() -> str:
    from bioeco_portal_etl_spark.similarity.fusion import duck_rrf_cte
    from bioeco_portal_etl_spark.text.bm25 import duck_bm25_ctes

    return f"""
WITH {duck_bm25_ctes("text", "doc_id", "documents", _BM25_TERMS, k=100)},
ve AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
vn AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(range(1, 65), i -> e[i] * e[i]),
                          (a, b) -> a + b)) AS nrm
  FROM ve
),
cosp AS (
  SELECT c.vec_id AS match_id,
         floor((list_reduce(list_transform(range(1, 65),
                                           i -> q.e[i] * c.e[i]),
                            (a, b) -> a + b) / (q.nrm * c.nrm))
               * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM vn WHERE vec_id = {_RRF_QUERY_VEC}) q
  JOIN vn c ON q.vec_id <> c.vec_id
),
cosr AS (
  SELECT match_id, rank FROM (
    SELECT match_id,
           row_number() OVER (ORDER BY score_e4 DESC, match_id) AS rank
    FROM cosp)
  WHERE rank <= 100
),
{duck_rrf_cte("bm25r", "cosr", "doc_id", "match_id", k=50)}
SELECT id, rank_a, rank_b, rrf_e6, rank FROM rrfr ORDER BY rank"""


# ---------------------------------------------------------------------------
# gr7 / gr8 — same-day customer co-activity graph
# ---------------------------------------------------------------------------

_COACT_EDGES_SQL = """SELECT a.o_custkey AS src, b.o_custkey AS dst
  FROM orders a JOIN orders b
    ON a.o_orderdate = b.o_orderdate AND a.o_custkey <> b.o_custkey"""


def _coactivity_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Customers active on the same order date — a bounded-fan-out
    projection graph (daily cohort sizes are small constants), the same
    shape as catalog_ext2's co-order supplier graph but over a sparser
    key, so communities/cores are non-trivial."""
    o = T(spark, sf, "orders").select("o_custkey", "o_orderdate")
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(b, "o_orderdate")
        .filter(F.col("a.o_custkey") != F.col("b.o_custkey"))
        .select(
            F.col("a.o_custkey").alias("src"),
            F.col("b.o_custkey").alias("dst"),
        )
    )


def gr7_label_communities(spark: SparkSession, sf: str) -> DataFrame:
    """2 synchronous label-propagation rounds (graph/labelprop.py) over
    the co-activity graph; 20 largest communities. Deterministic variant:
    frequency ties break on the smallest label."""
    from bioeco_portal_etl_spark.graph.labelprop import (
        community_sizes,
        label_propagation,
    )

    # The co-activity join already emits BOTH orderings of every pair
    # (the <> condition), so distinct(e) == distinct(e UNION swap(e)) —
    # pre_symmetrized skips the 2x union the generic path would pay, and
    # the repartition("src") + dropDuplicates layout (one exchange,
    # subset-of-keys rule) leaves every LPA round exchange-free
    # (round-12, guide §2.4; same shared-frame shape as gr20).
    sym = (
        _coactivity_edges(spark, sf)
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    return community_sizes(
        label_propagation(
            sym, rounds=2, pre_symmetrized=True, persist_edges=False
        ),
        top_k=20,
    )


def _gr7_sql() -> str:
    from bioeco_portal_etl_spark.graph.labelprop import duck_label_propagation

    return f"""
WITH {duck_label_propagation(_COACT_EDGES_SQL, rounds=2)}
SELECT label AS community, count(*)::BIGINT AS size
FROM l2 GROUP BY label
ORDER BY size DESC, community LIMIT 20"""


# k=4 is the largest k whose core is non-empty at EVERY gate SF: the
# sf0.001 co-activity graph tops out at 5-customer date cohorts (max
# clique 5 -> max possible core 4), so the original k=8 hash-matched
# empty-vs-empty there — the round-8 sweep's vacuous-gate finding. At
# sf0.01/sf0.1 (max cohorts 16/90) k=4 still peels a real fringe.
_KCORE_K = 4


def gr8_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """The {k}-core of the co-activity graph (graph/kcore.py): nodes
    surviving iterated delete-degree<{k} peeling, with their in-core
    degrees. Fixpoint is unique (order-independent), so no tie-break
    pinning is needed; the oracle unrolls 12 peels and pytest asserts the
    Spark loop converges within that budget on the gate data."""
    from bioeco_portal_etl_spark.graph.kcore import kcore

    # co-activity emits both orderings by construction — skip the
    # symmetrizing union inside kcore (round-12; dedupe still runs)
    return kcore(
        _coactivity_edges(spark, sf), k=_KCORE_K, pre_symmetrized=True
    ).orderBy("node")


gr8_kcore.__doc__ = gr8_kcore.__doc__.format(k=_KCORE_K)


def _gr8_sql() -> str:
    from bioeco_portal_etl_spark.graph.kcore import duck_kcore

    return f"""
WITH {duck_kcore(_COACT_EDGES_SQL, k=_KCORE_K, rounds=12)}
SELECT node, deg FROM core ORDER BY node"""


# ---------------------------------------------------------------------------
# dq7 — whole-schema profile drift between snapshots
# ---------------------------------------------------------------------------

_DQ7_COLS = [
    ("o_custkey", "numeric"),
    ("o_orderpriority", "categorical"),
    ("o_orderstatus", "categorical"),
    ("o_totalprice", "numeric"),
]
_DQ7_CUT = "1995-01-01"


def dq7_profile_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Column-profile drift between the pre-/post-{cut} order snapshots
    (operators/drift.py profile_drift): null count, cardinality, and
    numeric min/max/mean (exact DECIMAL sum) per column, long-format with
    per-metric deltas — the refresh-acceptance audit next to dq4's
    single-column PSI."""
    from bioeco_portal_etl_spark.operators.drift import profile_drift

    o = T(spark, sf, "orders")
    cut = F.lit(_DQ7_CUT).cast("timestamp")
    return profile_drift(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        _DQ7_COLS,
    )


dq7_profile_drift.__doc__ = dq7_profile_drift.__doc__.format(cut=_DQ7_CUT)


def _dq7_sql() -> str:
    from bioeco_portal_etl_spark.operators.drift import duck_profile_sql

    ref = (
        "(SELECT * FROM orders WHERE o_orderdate"
        f" < TIMESTAMP '{_DQ7_CUT} 00:00:00')"
    )
    cur = (
        "(SELECT * FROM orders WHERE o_orderdate"
        f" >= TIMESTAMP '{_DQ7_CUT} 00:00:00')"
    )
    return f"""
WITH r AS ({duck_profile_sql(ref, _DQ7_COLS, "ref_val")}),
c AS ({duck_profile_sql(cur, _DQ7_COLS, "cur_val")})
SELECT coalesce(r."column", c."column") AS "column",
       coalesce(r.metric, c.metric) AS metric,
       ref_val, cur_val,
       (cur_val - ref_val)::BIGINT AS delta
FROM r FULL OUTER JOIN c ON r."column" = c."column" AND r.metric = c.metric
ORDER BY "column", metric"""


# ---------------------------------------------------------------------------
# x25 — skew-salted join, result-identical to the plain join
# ---------------------------------------------------------------------------


def x25_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-salted fact⋈dim join (operators/skew.py salted_join): 30% of
    lineitem rows are remapped onto ONE hot supplier key (the synthetic
    celebrity-key skew), the fact side is salted 8 ways and the supplier
    dim replicated per salt, and the per-nation rollup must equal the
    plain join's — which is exactly what the oracle computes. The dim
    carries a merge-join hint: at fixture scale Catalyst would broadcast
    the 100-row dim (making salt irrelevant); the hint pins the shuffle
    path the operator exists for, mirroring a dim just over the broadcast
    threshold."""
    from bioeco_portal_etl_spark.operators.skew import salted_join

    li = T(spark, sf, "lineitem").select(
        F.expr(
            "CASE WHEN l_suppkey % 10 < 3 THEN 1 ELSE l_suppkey END"
        ).alias("skew_key"),
        "l_extendedprice",
        "l_discount",
    )
    dim = (
        T(spark, sf, "supplier")
        .select(F.col("s_suppkey").alias("skew_key"), "s_nationkey")
        .hint("merge")
    )
    joined = salted_join(li, dim, "skew_key", buckets=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


X25_SQL = """
WITH li AS (
  SELECT CASE WHEN l_suppkey % 10 < 3 THEN 1 ELSE l_suppkey END AS skew_key,
         l_extendedprice, l_discount
  FROM lineitem
)
SELECT s_nationkey, count(*)::BIGINT AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM li JOIN supplier ON skew_key = s_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey"""


CATALOG_EXT7 = {
    "tx22_bm25": (tx22_bm25, _tx22_sql()),
    "ts11_rrf_fusion": (ts11_rrf_fusion, _ts11_sql()),
    "gr7_label_communities": (gr7_label_communities, _gr7_sql()),
    "gr8_kcore": (gr8_kcore, _gr8_sql()),
    "dq7_profile_drift": (dq7_profile_drift, _dq7_sql()),
    "x25_salted_join": (x25_salted_join, X25_SQL),
}
