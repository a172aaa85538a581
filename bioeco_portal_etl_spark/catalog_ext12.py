"""Round-5 catalog extensions, ninth batch — 5 entries:

- tx27_gopher_rules: the Gopher structural-rule filter (Rae et al. 2021)
  as a per-rule flag table (text/gopher.py) — the hard-filter face of
  tx3's quality score, all-integer surfaces;
- dq9_fd_violations: approximate-functional-dependency audit
  (operators/quality.py fd_audit) — per candidate (LHS -> RHS) pair, how
  many keys violate and what row fraction a repair-to-majority keeps;
- x31_dsir_weights: DSIR hashed-bucket importance weights (Xie et al.
  2023; text/dsir.py) — the domain-matching resampling weight a raw
  corpus is reweighted by, as exact e6 integer likelihood ratios;
- ts14_hard_negatives: ANN hard-negative mining (similarity/knn.py
  hard_negative_topk) — top-k most-similar WRONG-label candidates per
  query, the ANCE-style pairs an embedding model trains on;
- w15_stream_cdc_upsert: LIVE streaming CDC apply — foreachBatch
  compact-stage-MERGE into an embedded Derby table (sinks/jdbc_upsert
  stage_and_cdc_merge); the drained TABLE STATE must equal the batch
  net effect.

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
# tx27 — Gopher structural-rule filter
# ---------------------------------------------------------------------------


def tx27_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document Gopher rule table over the full corpus: raw signals
    (word count, mean word length e2, alphabetic-word fraction e6,
    required-stopword hits, symbol-per-word e6), one 0/1 column per rule,
    and the pass_all conjunction a filter stage applies."""
    from bioeco_portal_etl_spark.text.gopher import gopher_flags

    d = T(spark, sf, "documents").select("doc_id", "text")
    return gopher_flags(d, "doc_id", "text").orderBy("doc_id")


def _tx27_sql() -> str:
    from bioeco_portal_etl_spark.text.gopher import duck_gopher_sql

    return f"""
WITH {duck_gopher_sql("SELECT doc_id, text FROM documents", "doc_id", "text").lstrip()}
SELECT doc_id, n_words, mwl_e2, alpha_frac_e6, stop_hits, symbol_e6,
       r_words, r_mwl, r_alpha, r_stop, r_symbol, pass_all
FROM gopherr ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# dq9 — approximate-FD audit
# ---------------------------------------------------------------------------

_DQ9_PAIRS = [
    ("o_custkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderstatus", "o_orderpriority"),
]


def dq9_fd_violations(spark: SparkSession, sf: str) -> DataFrame:
    """Does LHS determine RHS, and how badly not: for each candidate
    column pair over orders, the number of violating keys and the e6 row
    fraction a repair-to-majority mapping would keep (support_e6 =
    1e6 exactly iff the FD holds)."""
    from bioeco_portal_etl_spark.operators.quality import fd_audit

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return fd_audit(o, _DQ9_PAIRS).orderBy("lhs_col", "rhs_col")


def _dq9_sql() -> str:
    from bioeco_portal_etl_spark.operators.quality import duck_fd_audit_sql

    body = duck_fd_audit_sql(
        "SELECT o_custkey, o_orderstatus, o_orderpriority FROM orders",
        _DQ9_PAIRS,
    )
    return f"SELECT * FROM ({body}\n) ORDER BY lhs_col, rhs_col"


# ---------------------------------------------------------------------------
# x31 — DSIR importance weights
# ---------------------------------------------------------------------------


def x31_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weight per document (target domain = lang 'en'):
    sum over the document's tokens of the add-one-smoothed target/raw
    hashed-bucket likelihood ratio, as exact e6 integers — the weight a
    domain-matching resample draws by."""
    from bioeco_portal_etl_spark.text.dsir import dsir_weights

    d = T(spark, sf, "documents").select("doc_id", "text", "lang")
    return dsir_weights(
        d, "doc_id", "text", F.col("lang") == "en"
    ).orderBy("doc_id")


def _x31_sql() -> str:
    from bioeco_portal_etl_spark.text.dsir import duck_dsir_sql

    ctes = duck_dsir_sql(
        "SELECT doc_id, text, lang FROM documents",
        "doc_id",
        "text",
        "lang = 'en'",
    )
    return f"""
WITH {ctes.lstrip()}
SELECT doc_id, n_tokens, w_e6 FROM dsirr ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# ts14 — hard-negative mining
# ---------------------------------------------------------------------------


def ts14_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 hard negatives for each of the first 5 query vectors: the
    most-cosine-similar corpus vectors whose LABEL differs from the
    query's (similarity/knn.py hard_negative_topk) — the near-miss pairs
    a contrastive loss trains on."""
    from bioeco_portal_etl_spark.similarity.knn import hard_negative_topk

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return (
        hard_negative_topk(e, q, "embedding", "vec_id", "label", k=5)
        .select(
            "query_id",
            "match_id",
            F.col("neg_label").cast("long").alias("neg_label"),
            "score_e4",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


TS14_SQL = """
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
         c.label::BIGINT AS neg_label,
         floor((list_reduce(list_transform(range(1, 65),
                                           i -> q.e[i] * c.e[i]),
                            (a, b) -> a + b) / (q.nrm * c.nrm))
               * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id < 5) q
  JOIN n c ON q.label <> c.label
)
SELECT query_id, match_id, neg_label, score_e4, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score_e4 DESC, match_id)::BIGINT
              AS rank
  FROM p)
WHERE rank <= 5 ORDER BY query_id, rank"""


# ---------------------------------------------------------------------------
# w15 — LIVE streaming CDC apply into an embedded JDBC target
# ---------------------------------------------------------------------------

_W15_URL = "jdbc:derby:memory:w15db;create=true"
_W15_TABLE = "w15_state"


def w15_stream_cdc_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """LIVE streaming CDC sink: the event stream becomes a changelog
    (entity = event_id % 500, seq = event_id, op 0/1/2 from the event
    type), each micro-batch is compacted to per-key last ops and applied
    to an embedded Derby table with ONE server-side seq-guarded CDC
    MERGE (sinks/jdbc_upsert.stage_and_cdc_merge). The drained TABLE
    STATE — live rows only, deletes really gone — must equal the batch
    net effect, which is the oracle.

    Ordering contract: final state is batch-split-independent because
    seqs are globally unique, each batch applies max-seq-per-key, and
    the MERGE guard drops stale rows (see build_cdc_merge_sql on the
    tombstone-less delete caveat)."""
    import os

    from bioeco_portal_etl_spark.sinks.jdbc_upsert import stage_and_cdc_merge
    from bioeco_portal_etl_spark.sources.jdbc import read_jdbc_table
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    T(spark, sf, "events")  # pins UTC session tz
    empty = spark.createDataFrame(
        [], "entity long, seq long, op_code int, v_e4 long"
    )
    empty.write.jdbc(_W15_URL, _W15_TABLE, mode="overwrite")

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(os.path.join(sf, "events.parquet*"))
        .select(
            (F.col("event_id") % 500).alias("entity"),
            F.col("event_id").alias("seq"),
            F.expr(
                "CASE event_type WHEN 'signup' THEN 0 WHEN 'error' THEN 2"
                " ELSE 1 END"
            ).cast("int").alias("op_code"),
            F.expr("CAST(floor(value * 1e4) AS BIGINT)").alias("v_e4"),
        )
    )

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        stage_and_cdc_merge(
            batch_df, _W15_URL, _W15_TABLE,
            ["entity"], "seq", "op_code", ["v_e4"],
        )

    with scoped_shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(_apply)
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w15 stream did not drain")

    state = read_jdbc_table(spark, _W15_URL, _W15_TABLE)
    return state.select(
        F.col("entity").alias("key"),
        F.col("seq").alias("last_seq"),
        F.col("v_e4").alias("net_value"),
    ).orderBy("key")


W15_SQL = """
WITH ops AS (
  SELECT event_id % 500 AS entity, event_id AS seq,
         CASE event_type WHEN 'signup' THEN 0 WHEN 'error' THEN 2
              ELSE 1 END AS op_code,
         CAST(floor(value * 1e4) AS BIGINT) AS v_e4
  FROM events
),
last AS (
  SELECT entity, max(seq)::BIGINT AS last_seq,
         max_by(op_code, seq) AS op, max_by(v_e4, seq) AS net_value
  FROM ops GROUP BY entity
)
SELECT entity AS key, last_seq, net_value::BIGINT AS net_value
FROM last WHERE op <> 2 ORDER BY key"""


CATALOG_EXT12 = {
    "tx27_gopher_rules": (tx27_gopher_rules, _tx27_sql()),
    "dq9_fd_violations": (dq9_fd_violations, _dq9_sql()),
    "x31_dsir_weights": (x31_dsir_weights, _x31_sql()),
    "ts14_hard_negatives": (ts14_hard_negatives, TS14_SQL),
    "w15_stream_cdc_upsert": (w15_stream_cdc_upsert, W15_SQL),
}
