"""Round-5 catalog extensions, seventh batch — 6 entries:

- gr9_hits: HITS hubs/authorities (graph/hits.py) over the bipartite
  customer→supplier purchase graph — max-normalized e6 fixed point, the
  second classic link-analysis scorer next to gr1's PageRank;
- tx26_rake_keywords: RAKE stopword-delimited phrase extraction
  (text/rake.py) — degree/frequency word scores summed per candidate
  phrase, the multi-word complement of tx5's tf-idf terms;
- ts12_range_search: cosine RADIUS search (similarity/knn.py
  cosine_range_search) — all matches above a similarity floor, the
  data-determined twin of top-k;
- ts13_filtered_ann: FILTERED vector search — metadata predicate
  (label = 3) pushed into the parquet scan below the broadcast scoring
  join, the vector-store capability every RAG stack filters by source/
  language/date;
- x29_cdc_net_effect: changelog compaction to net effect per key
  (operators/cdc.py net_effect) — the Debezium-style I/U/D collapse a
  MERGE sink applies per batch;
- w14_stream_complete_topk: LIVE complete-output-mode streaming top-k —
  the leaderboard face of streaming aggregation (sort+limit is legal
  only in complete mode; the drained table must equal the batch top-k
  exactly, no watermark horizon).

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
# gr9 — HITS on the customer→supplier purchase graph
# ---------------------------------------------------------------------------

_GR9_EDGES_SQL = """SELECT o_custkey AS src, l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey"""


def gr9_hits(spark: SparkSession, sf: str) -> DataFrame:
    """2-iteration HITS (graph/hits.py): hubs = customers weighted by the
    authority of the suppliers they buy from, authorities = suppliers
    weighted by their buyers' hub scores; e6 fixed point, max-normalized
    per half-step."""
    from bioeco_portal_etl_spark.graph.hits import hits

    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return hits(edges, iterations=2).orderBy("side", "node")


def _gr9_sql() -> str:
    from bioeco_portal_etl_spark.graph.hits import duck_hits

    return f"""
WITH {duck_hits(_GR9_EDGES_SQL, iterations=2)}
SELECT node, side, score_e6 FROM hitsr ORDER BY side, node"""


# ---------------------------------------------------------------------------
# tx26 — RAKE keyword extraction
# ---------------------------------------------------------------------------

_RAKE_STOP = ["the", "order", "scan", "batch"]


def tx26_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 RAKE phrases per document (first 300 docs): stopword-
    delimited candidate runs scored by summed word degree/frequency
    ratios (text/rake.py); ties break on the phrase string."""
    from bioeco_portal_etl_spark.text.rake import rake_keywords

    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return rake_keywords(
        d, "doc_id", "text", _RAKE_STOP, top_k=3
    ).orderBy("doc_id", "rank")


def _tx26_sql() -> str:
    from bioeco_portal_etl_spark.text.rake import duck_rake_ctes

    ctes = duck_rake_ctes(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 300)",
        "doc_id",
        "text",
        _RAKE_STOP,
        top_k=3,
    )
    return f"""
WITH {ctes.lstrip()}
SELECT doc_id, phrase, n_words, score_e4, rank
FROM raker ORDER BY doc_id, rank"""


# ---------------------------------------------------------------------------
# ts12 — cosine radius search
# ---------------------------------------------------------------------------

_TS12_THRESH = 2000


def ts12_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """All corpus vectors within cosine >= {t} e4 of each of the first 5
    query vectors (similarity/knn.py cosine_range_search): the radius
    twin of ts1's top-k — result set determined by the data, no
    per-query state after the broadcast."""
    from bioeco_portal_etl_spark.similarity.knn import cosine_range_search

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return cosine_range_search(
        e, q, "embedding", "vec_id", threshold_e4=_TS12_THRESH
    ).orderBy("query_id", "match_id")


ts12_range_search.__doc__ = ts12_range_search.__doc__.format(t=_TS12_THRESH)

TS12_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(range(1, 65), i -> e[i] * e[i]),
                          (a, b) -> a + b)) AS nrm
  FROM v
)
SELECT q.vec_id AS query_id, c.vec_id AS match_id,
       floor((list_reduce(list_transform(range(1, 65),
                                         i -> q.e[i] * c.e[i]),
                          (a, b) -> a + b) / (q.nrm * c.nrm))
             * 10000)::BIGINT AS score_e4
FROM (SELECT * FROM n WHERE vec_id < 5) q
JOIN n c ON q.vec_id <> c.vec_id
WHERE floor((list_reduce(list_transform(range(1, 65),
                                        i -> q.e[i] * c.e[i]),
                         (a, b) -> a + b) / (q.nrm * c.nrm))
            * 10000) >= {_TS12_THRESH}
ORDER BY query_id, match_id"""


# ---------------------------------------------------------------------------
# ts13 — filtered ANN (metadata predicate below the scoring join)
# ---------------------------------------------------------------------------

_TS13_LABEL = 3


def ts13_filtered_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered vector search: top-10 cosine matches for query vector 7
    among label={l} vectors only — the metadata-filtered retrieval every
    vector store exposes; the label predicate reaches the parquet scan
    (plan-pinned), so non-matching vectors are never scored."""
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk

    e = T(spark, sf, "embeddings")
    corpus = e.filter(F.col("label") == _TS13_LABEL)
    q = e.filter(F.col("vec_id") == 7)
    return cosine_topk(
        corpus, q, "embedding", "vec_id", k=10, exclude_self=True
    ).orderBy("rank")


ts13_filtered_ann.__doc__ = ts13_filtered_ann.__doc__.format(l=_TS13_LABEL)

TS13_SQL = f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_reduce(list_transform(range(1, 65), i -> e[i] * e[i]),
                          (a, b) -> a + b)) AS nrm
  FROM v
),
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor((list_reduce(list_transform(range(1, 65),
                                           i -> q.e[i] * c.e[i]),
                            (a, b) -> a + b) / (q.nrm * c.nrm))
               * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id = 7) q
  JOIN (SELECT * FROM n WHERE label = {_TS13_LABEL}) c
    ON q.vec_id <> c.vec_id
)
SELECT query_id, match_id, score_e4, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score_e4 DESC, match_id) AS rank
  FROM p)
WHERE rank <= 10 ORDER BY rank"""


# ---------------------------------------------------------------------------
# x29 — changelog net-effect compaction
# ---------------------------------------------------------------------------


def x29_cdc_net_effect(spark: SparkSession, sf: str) -> DataFrame:
    """Net I/U/D effect per entity for a synthetic changelog derived from
    the event stream (entity = event_id % 400, sequence = event_id, op
    mapped from the event type, value e4-floored): the compaction a
    MERGE sink applies before touching the target table (operators/
    cdc.py net_effect)."""
    from bioeco_portal_etl_spark.operators.cdc import net_effect

    ev = T(spark, sf, "events").select(
        (F.col("event_id") % 400).alias("entity"),
        F.col("event_id").alias("seq"),
        F.expr(
            "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'"
            " ELSE 'U' END"
        ).alias("op"),
        F.expr("CAST(floor(value * 1e4) AS BIGINT)").alias("v_e4"),
    )
    return net_effect(ev, "entity", "seq", "op", "v_e4").orderBy("key")


X29_SQL = """
WITH ops AS (
  SELECT event_id % 400 AS entity, event_id AS seq,
         CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
              ELSE 'U' END AS op,
         CAST(floor(value * 1e4) AS BIGINT) AS v_e4
  FROM events
)
SELECT entity AS key, count(*)::BIGINT AS n_ops,
       min_by(op, seq) AS first_op, max_by(op, seq) AS last_op,
       CASE WHEN min_by(op, seq) = 'I' AND max_by(op, seq) = 'D' THEN 'NONE'
            WHEN min_by(op, seq) = 'I' THEN 'I'
            WHEN max_by(op, seq) = 'D' THEN 'D' ELSE 'U' END AS net_op,
       CASE WHEN max_by(op, seq) <> 'D' THEN max_by(v_e4, seq) END
         AS net_value
FROM ops GROUP BY entity
ORDER BY key"""


# ---------------------------------------------------------------------------
# w14 — complete-mode streaming top-k leaderboard
# ---------------------------------------------------------------------------


def w14_stream_complete_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LIVE complete-output-mode leaderboard: top-10 (event_type, user
    bucket) cells by event count. Complete mode re-emits the FULL result
    per micro-batch (sort+limit is only legal here), so after an
    availableNow drain the memory sink holds exactly the batch top-10 —
    no watermark horizon, the contract difference vs the append-mode
    w9/w13 family."""
    import os

    T(spark, sf, "events")  # pins UTC session tz
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select("event_type", (F.col("user_id") % 100).alias("u_bucket"))
    )
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    top = (
        stream.groupBy("event_type", "u_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type", "u_bucket")
        .limit(10)
    )
    with scoped_shuffle_partitions(spark, 8):
        q = (
            top.writeStream.format("memory")
            .queryName("w14_topk_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w14 stream did not drain")
    return spark.table("w14_topk_mem").orderBy(
        F.desc("n"), "event_type", "u_bucket"
    )


W14_SQL = """
SELECT event_type, user_id % 100 AS u_bucket, count(*)::BIGINT AS n
FROM events
GROUP BY 1, 2
ORDER BY n DESC, event_type, u_bucket
LIMIT 10"""


CATALOG_EXT10 = {
    "gr9_hits": (gr9_hits, _gr9_sql()),
    "tx26_rake_keywords": (tx26_rake_keywords, _tx26_sql()),
    "ts12_range_search": (ts12_range_search, TS12_SQL),
    "ts13_filtered_ann": (ts13_filtered_ann, TS13_SQL),
    "x29_cdc_net_effect": (x29_cdc_net_effect, X29_SQL),
    "w14_stream_complete_topk": (w14_stream_complete_topk, W14_SQL),
}
