"""Round-5 catalog extensions — 4 entries:

- gr6_dup_components: transitive duplicate clusters = connected components
  (graph/cc.py min-label + pointer-jumping) over the union of two
  blocking-key edge generators (content-prefix hash, lang+length block) —
  the entity-resolution step that turns pairwise dup evidence into groups;
- dq3_split_leakage: content-hash leakage audit across the deterministic
  train/val split (operators/leakage.py) — the pre-training QA gate;
- x22_incremental_agg: materialized-rollup maintenance by merging the
  delta's partial aggregate into the base's (operators/incremental.py) —
  merged result must equal a full recompute, which is what the oracle
  computes;
- mm6_png_channel_stats: per-channel pixel statistics through a REAL PNG
  encode->decode round-trip (multimodal/png.py, pure stdlib) — the oracle
  recomputes the deterministic source pixels with pure SQL arithmetic, so
  a hash match proves the codec path end-to-end.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs over the
driver's synthetic tables, aliased identically on both sides, ending in a
deterministic ORDER BY; integer surfaces BIGINT-cast per PORTABILITY.md
(machine-enforced by tests/oracle.py's type lint since round 5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr6 — transitive duplicate clusters via connected components
# ---------------------------------------------------------------------------


def _star_edges(grouped: DataFrame) -> DataFrame:
    """(h, doc_id) -> star edges (min-id -> other) per hash group: the
    standard linear-size encoding of 'all docs in this block are related'
    (|group|-1 edges, never the quadratic all-pairs expansion)."""
    w = Window.partitionBy("h")
    return (
        grouped.withColumn("m", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("m"))
        .select(F.col("m").alias("src"), F.col("doc_id").alias("dst"))
    )


def gr6_dup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive dup clusters: star edges from TWO independent blocking
    keys (md5 of the 100-char content prefix; md5 of lang:length) are
    unioned and closed under connectivity (graph/cc.py) — doc A ~ B by
    prefix and B ~ C by block must land A,B,C in ONE cluster, which no
    single groupBy can produce. Output: every doc participating in any
    dup relation, its component (= min doc_id reachable) and the
    component size."""
    from bioeco_portal_etl_spark.graph.cc import connected_components

    d = T(spark, sf, "documents").select(
        "doc_id", "lang", F.coalesce("text", F.lit("")).alias("t")
    )
    prefix = d.select(F.md5(F.substring("t", 1, 100)).alias("h"), "doc_id")
    block = d.select(
        F.md5(
            F.concat(F.col("lang"), F.lit(":"), F.length("t").cast("string"))
        ).alias("h"),
        "doc_id",
    )
    edges = _star_edges(prefix).unionByName(_star_edges(block))
    cc = connected_components(edges)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return (
        cc.join(sizes, "component")
        .select(F.col("node").alias("doc_id"), "component", "component_size")
        .orderBy("doc_id")
    )


def _gr6_sql() -> str:
    from bioeco_portal_etl_spark.graph.cc import duck_connected_components

    return f"""WITH RECURSIVE
d AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM documents),
ph AS (SELECT md5(substr(t, 1, 100)) AS h, doc_id FROM d),
lh AS (SELECT md5(lang || ':' || length(t)::VARCHAR) AS h, doc_id FROM d),
s1 AS (SELECT min(doc_id) OVER (PARTITION BY h) AS m, doc_id FROM ph),
e1 AS (SELECT m AS src, doc_id AS dst FROM s1 WHERE doc_id <> m),
s2 AS (SELECT min(doc_id) OVER (PARTITION BY h) AS m, doc_id FROM lh),
e2 AS (SELECT m AS src, doc_id AS dst FROM s2 WHERE doc_id <> m),
eall AS (SELECT src, dst FROM e1 UNION SELECT src, dst FROM e2),
{duck_connected_components("SELECT src, dst FROM eall")},
sizes AS (
  SELECT component, count(*)::BIGINT AS component_size FROM cc GROUP BY component
)
SELECT cc.node AS doc_id, cc.component, sizes.component_size
FROM cc JOIN sizes USING (component)
ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# dq3 — split-leakage audit (content collisions across train/val)
# ---------------------------------------------------------------------------


def dq3_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Fingerprint leakage across the SAME deterministic stratified split
    the x2 entry ships (operators/sampling.py): every content fingerprint
    (100-char prefix — catches the near-dup re-ingests exact full-text
    hashing misses, the same reason decontamination works on n-grams)
    with docs on both sides of the split, with per-side counts and the
    lowest doc id as the exemplar to inspect. Empty = leak-free corpus."""
    from bioeco_portal_etl_spark.catalog_ext import X2_DEFAULT, X2_FRACS
    from bioeco_portal_etl_spark.operators.leakage import split_leakage
    from bioeco_portal_etl_spark.operators.sampling import (
        stratified_hash_split,
    )

    d = T(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.substring(F.coalesce("text", F.lit("")), 1, 100).alias("fp"),
    )
    s = stratified_hash_split(
        d, "doc_id", "lang", X2_FRACS, default_frac=X2_DEFAULT
    )
    return split_leakage(s, "doc_id", "fp", "split").orderBy("content_hash")


def _dq3_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _X2_CASES, X2_DEFAULT

    return f"""
WITH b AS (
  SELECT doc_id, substr(coalesce(text, ''), 1, 100) AS fp,
         list_reduce(list_transform(range(1, 9),
             i -> (strpos('0123456789abcdef',
                          substr(md5(doc_id::VARCHAR), i, 1)) - 1)::BIGINT),
           (a, x) -> a * 16 + x) % 10000 AS bucket,
         CASE {_X2_CASES} ELSE {int(X2_DEFAULT * 10000)} END AS thr
  FROM documents
),
s AS (
  SELECT doc_id, md5(fp) AS content_hash,
         CASE WHEN bucket < thr THEN 1 ELSE 0 END AS is_train
  FROM b
)
SELECT content_hash,
       count(*)::BIGINT AS n_docs,
       sum(is_train)::BIGINT AS n_train,
       (count(*) - sum(is_train))::BIGINT AS n_eval,
       min(doc_id) AS min_doc
FROM s
GROUP BY content_hash
HAVING sum(is_train) > 0 AND count(*) - sum(is_train) > 0
ORDER BY content_hash"""


# ---------------------------------------------------------------------------
# x22 — incremental aggregate maintenance (merge == full recompute)
# ---------------------------------------------------------------------------

_X22_CUTOFF = "1997-01-01"


def x22_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly (priority, month) order rollup maintained INCREMENTALLY:
    partial_agg over the pre-cutoff base, partial_agg over the post-cutoff
    delta, merged with operators/incremental.py merge_aggs — no base
    rescan. The oracle computes the rollup from the full table in one
    pass; hash equality IS the merged==recomputed proof. Money runs as
    DECIMAL through the merge, DOUBLE at the surface (PORTABILITY.md)."""
    from bioeco_portal_etl_spark.operators.incremental import (
        merge_aggs,
        partial_agg,
    )

    o = T(spark, sf, "orders").select(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        "o_orderdate",
        "o_totalprice",
    )
    keys = ["o_orderpriority", "order_month"]
    base = partial_agg(
        o.filter(F.col("o_orderdate") < _X22_CUTOFF), keys, "o_totalprice"
    )
    delta = partial_agg(
        o.filter(F.col("o_orderdate") >= _X22_CUTOFF), keys, "o_totalprice"
    )
    return (
        merge_aggs(base, delta, keys)
        .select(
            "o_orderpriority",
            "order_month",
            "n_rows",
            F.col("sum_val").cast("double").alias("sum_price"),
            F.col("min_val").cast("double").alias("min_price"),
            F.col("max_val").cast("double").alias("max_price"),
        )
        .orderBy("o_orderpriority", "order_month")
    )


X22_SQL = """
SELECT o_orderpriority,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       count(*)::BIGINT AS n_rows,
       sum(CAST(o_totalprice AS DECIMAL(28,6)))::DOUBLE AS sum_price,
       min(CAST(o_totalprice AS DECIMAL(28,6)))::DOUBLE AS min_price,
       max(CAST(o_totalprice AS DECIMAL(28,6)))::DOUBLE AS max_price
FROM orders
GROUP BY o_orderpriority, order_month
ORDER BY o_orderpriority, order_month"""


# ---------------------------------------------------------------------------
# mm6 — PNG codec round-trip proven by pixel statistics
# ---------------------------------------------------------------------------


def mm6_png_channel_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-channel pixel stats through the REAL codec: deterministic RGB
    gradients are encoded to genuine PNG bytes (multimodal/png.py) in one
    mapInPandas stage, then fully DECODED (inflate + filter
    reconstruction) and reduced to (n_px, floor-mean, min, max) per
    channel in a second — a binary column crossing a stage boundary, like
    a real image pipeline. The oracle recomputes the same numbers from the
    pixel FORMULA with pure SQL arithmetic; matching hashes prove
    encode->decode is the identity on every byte that matters."""
    from bioeco_portal_etl_spark.multimodal.media import (
        png_channel_stats,
        synth_rgb_png,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
    )
    return png_channel_stats(synth_rgb_png(ids, "doc_id")).orderBy(
        "media_id", "channel"
    )


def _mm6_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
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
)
SELECT doc_id AS media_id, channel,
       count(*)::BIGINT AS n_px,
       CAST(sum(v) // count(*) AS BIGINT) AS mean_v,
       min(v)::BIGINT AS min_v,
       max(v)::BIGINT AS max_v
FROM px
GROUP BY doc_id, channel
ORDER BY media_id, channel"""


# ---------------------------------------------------------------------------
# ts9 — ANN quality measurement: recall@k of IVF vs exact
# ---------------------------------------------------------------------------


def ts9_recall_at_k(spark: SparkSession, sf: str) -> DataFrame:
    """Per-query recall@5 of the IVF index (ts3 configuration: injected
    centroids vec_id<8, nprobe=2) against brute-force cosine (ts1) — the
    accept/reject number every ANN deployment tracks before trading exact
    search for the bucketed path. Both sides are the engine's own
    operators; the measurement is a key-join of two top-k tables (query
    count × k rows each — tiny regardless of corpus size)."""
    from bioeco_portal_etl_spark.catalog_ext import _query_vectors
    from bioeco_portal_etl_spark.similarity.ivf import ivf_topk
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk

    e = T(spark, sf, "embeddings")
    q = _query_vectors(spark, sf)
    exact = cosine_topk(e, q, "embedding", "vec_id", k=5).select(
        "query_id", "match_id"
    )
    approx = ivf_topk(
        e,
        q,
        e.filter(F.col("vec_id") < 8),
        "embedding",
        "vec_id",
        k=5,
        nprobe=2,
    ).select("query_id", "match_id", F.lit(1).alias("__hit"))
    return (
        exact.join(approx, ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            F.expr("(10000 * n_hits) div n_exact").alias("recall_e4"),
        )
        .orderBy("query_id")
    )


def _ts9_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_COS, _DUCK_VEC

    return f"""
WITH {_DUCK_VEC},
xp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({_DUCK_COS}) * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id < 10) q
  JOIN n c ON q.vec_id <> c.vec_id
),
exact AS (
  SELECT query_id, match_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM xp)
  WHERE rank <= 5
),
cent AS (SELECT vec_id AS cell_id, e, nrm FROM n WHERE vec_id < 8),
ca AS (
  SELECT x.vec_id AS cid, x.e AS xe, x.nrm AS xn, c.cell_id,
         floor(
           list_reduce(list_transform(range(1, 65), i -> x.e[i] * c.e[i]),
                       (a, b) -> a + b) / (x.nrm * c.nrm) * 10000)::BIGINT AS c_score
  FROM n x CROSS JOIN cent c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cid ORDER BY c_score DESC, cell_id) AS rk
  FROM ca
),
assigned AS (SELECT cell_id, cid, xe, xn FROM ranked WHERE rk = 1),
probes AS (SELECT cell_id, cid AS q_id, xe AS qe, xn AS qn
           FROM ranked WHERE cid < 10 AND rk <= 2),
ap AS (
  SELECT pr.q_id AS query_id, a.cid AS match_id,
         floor(
           list_reduce(list_transform(range(1, 65), i -> pr.qe[i] * a.xe[i]),
                       (x, y) -> x + y) / (pr.qn * a.xn) * 10000)::BIGINT AS score_e4
  FROM probes pr JOIN assigned a USING (cell_id)
  WHERE pr.q_id <> a.cid
),
approx AS (
  SELECT query_id, match_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM ap)
  WHERE rank <= 5
)
SELECT e.query_id,
       count(*)::BIGINT AS n_exact,
       CAST(sum(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST((10000 * sum(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS recall_e4
FROM exact e
LEFT JOIN approx a ON a.query_id = e.query_id AND a.match_id = e.match_id
GROUP BY e.query_id
ORDER BY e.query_id"""


CATALOG_EXT4 = {
    "gr6_dup_components": (gr6_dup_components, _gr6_sql()),
    "dq3_split_leakage": (dq3_split_leakage, _dq3_sql()),
    "x22_incremental_agg": (x22_incremental_agg, X22_SQL),
    "mm6_png_channel_stats": (mm6_png_channel_stats, _mm6_sql()),
    "ts9_recall_at_k": (ts9_recall_at_k, _ts9_sql()),
}
