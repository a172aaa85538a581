"""Round-6 catalog extensions, ninth batch — 5 entries:

- td14_dedupe_agreement: Venn audit of the exact prefix-cluster dup
  pairs against td2's MinHash-LSH candidate pairs — how much of the
  known-dup mass the probabilistic path covers and how much extra it
  proposes (pipeline-agreement certification);
- x48_top_movers: biggest month-over-month revenue swings per part
  class — the rel35 growth machinery fanned per group with a bounded
  top-k head;
- rel37_top_paths: most frequent length-3 event-type journeys per user
  stream (two lead() windows, complete triples only) — the
  path-mining/Sankey feed;
- mm21_frame_motion: inter-frame sum-of-absolute-differences through
  the payload frames (multimodal/media.py frame_motion) — the motion
  triage next to mm5's cut flags;
- tx40_hapax_ratio: hapax/dis legomena share of each language's
  vocabulary — the vocabulary-richness statistic (high hapax share =
  productive/creative text; low = template).

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# td14 — exact-vs-LSH dedupe agreement
# ---------------------------------------------------------------------------


def td14_dedupe_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """One-row Venn: exact prefix-cluster pairs vs LSH candidates.
    Exact pairs enumerate INSIDE clusters only (cluster sizes are
    single digits — the td12 sampled-slice argument); the LSH side is
    td2's banded candidate set. exact_covered_e6 is LSH's recall of
    known dups; lsh_extra is its additional (to-be-verified) volume."""
    from bioeco_portal_etl_spark.text.dedupe import minhash_lsh_pairs

    d = T(spark, sf, "documents")
    fp = d.select(
        "doc_id",
        F.md5(F.substring(F.coalesce("text", F.lit("")), 1, 100)).alias("fp"),
    )
    a = fp.alias("a")
    b = fp.alias("b")
    exact = (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    lsh = minhash_lsh_pairs(d, "doc_id", "text").select(
        "id_a", "id_b", F.lit(1).alias("__l")
    )
    ex = exact.join(lsh, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_exact_pairs"),
        F.sum(F.coalesce("__l", F.lit(0))).alias("n_both"),
    )
    nl = lsh.agg(F.count(F.lit(1)).alias("n_lsh_pairs"))
    return ex.crossJoin(F.broadcast(nl)).select(
        F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
        F.col("n_lsh_pairs").cast("long").alias("n_lsh_pairs"),
        F.col("n_both").cast("long").alias("n_both"),
        F.expr(
            "CASE WHEN n_exact_pairs > 0 THEN"
            " CAST((1000000 * n_both) div n_exact_pairs AS BIGINT) END"
        ).alias("exact_covered_e6"),
        (F.col("n_lsh_pairs") - F.col("n_both"))
        .cast("long")
        .alias("lsh_extra_pairs"),
    )


def _td14_sql() -> str:
    # reuse td2's full driver-green oracle as the LSH arm (import from
    # the defining module, NOT catalog.py — that would be circular)
    from bioeco_portal_etl_spark.catalog_ext import TD2_SQL

    td2 = TD2_SQL.strip().rstrip(";")
    return f"""
WITH lsh AS ({td2}),
fp AS (
  SELECT doc_id, md5(substr(coalesce(text, ''), 1, 100)) AS fp
  FROM documents
),
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
ex AS (
  SELECT count(*)::BIGINT AS n_exact_pairs,
         sum(CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_both
  FROM exact e LEFT JOIN lsh l USING (id_a, id_b)
),
nl AS (SELECT count(*)::BIGINT AS n_lsh_pairs FROM lsh)
SELECT ex.n_exact_pairs, nl.n_lsh_pairs, ex.n_both,
       CASE WHEN ex.n_exact_pairs > 0 THEN
         CAST((1000000 * ex.n_both) // ex.n_exact_pairs AS BIGINT) END
         AS exact_covered_e6,
       (nl.n_lsh_pairs - ex.n_both)::BIGINT AS lsh_extra_pairs
FROM ex CROSS JOIN nl"""


# ---------------------------------------------------------------------------
# x48 — top month-over-month movers
# ---------------------------------------------------------------------------


def x48_top_movers(spark: SparkSession, sf: str) -> DataFrame:
    """Top-15 (class, month) revenue swings by |MoM delta| (cents) over
    part classes l_partkey % 40 — per-class lag windows on the
    (class, month) rollup, then a bounded TakeOrdered head.
    Deterministic order: (|delta| DESC, class, month)."""
    li = T(spark, sf, "lineitem").select(
        (F.col("l_partkey") % 40).cast("long").alias("cls"),
        F.date_trunc("month", F.col("l_shipdate").cast("timestamp")).alias(
            "month"
        ),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias("p_e2"),
    )
    m = li.groupBy("cls", "month").agg(F.sum("p_e2").alias("rev_e2"))
    w = Window.partitionBy("cls").orderBy("month")
    d = (
        m.withColumn("prev_rev_e2", F.lag("rev_e2").over(w))
        .filter(F.col("prev_rev_e2").isNotNull())
        .withColumn("delta_e2", F.col("rev_e2") - F.col("prev_rev_e2"))
    )
    return (
        d.select(
            "cls",
            "month",
            F.col("rev_e2").cast("long").alias("rev_e2"),
            F.col("prev_rev_e2").cast("long").alias("prev_rev_e2"),
            F.col("delta_e2").cast("long").alias("delta_e2"),
        )
        .orderBy(F.desc(F.abs(F.col("delta_e2"))), "cls", "month")
        .limit(15)
    )


def _x48_sql() -> str:
    return """
WITH m AS (
  SELECT CAST(l_partkey % 40 AS BIGINT) AS cls,
         time_bucket(INTERVAL '1 month', CAST(l_shipdate AS TIMESTAMP))
           AS month,
         sum(CAST(floor(l_extendedprice * 100) AS BIGINT))::BIGINT AS rev_e2
  FROM lineitem GROUP BY 1, 2
),
d AS (
  SELECT cls, month, rev_e2,
         lag(rev_e2) OVER (PARTITION BY cls ORDER BY month) AS prev_rev_e2
  FROM m
)
SELECT cls, month, rev_e2, prev_rev_e2,
       (rev_e2 - prev_rev_e2)::BIGINT AS delta_e2
FROM d WHERE prev_rev_e2 IS NOT NULL
ORDER BY abs(rev_e2 - prev_rev_e2) DESC, cls, month LIMIT 15"""


# ---------------------------------------------------------------------------
# rel37 — top length-3 event paths
# ---------------------------------------------------------------------------


def rel37_top_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 (e1 -> e2 -> e3) event-type journeys over per-user streams
    ordered by (ts, event_id) — two lead() windows, complete triples
    only; ties break on the path text."""
    ev = T(spark, sf, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )


def _rel37_sql() -> str:
    return """
WITH tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT e1, e2, e3, count(*)::BIGINT AS n
FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3 LIMIT 20"""


# ---------------------------------------------------------------------------
# mm21 — inter-frame motion energy
# ---------------------------------------------------------------------------


def mm21_frame_motion(spark: SparkSession, sf: str) -> DataFrame:
    """Per-clip SAD motion over 64-byte frames of the payload (first 8
    frames, the mm5 framing) — multimodal/media.py frame_motion."""
    from bioeco_portal_etl_spark.multimodal.media import (
        attach_payload,
        frame_motion,
    )

    d = T(spark, sf, "documents")
    return frame_motion(
        attach_payload(d, "doc_id", "text"), frame_bytes=64, max_frames=8
    ).orderBy("media_id")


def _mm21_sql() -> str:
    return """
WITH f AS (
  SELECT doc_id AS media_id, text,
         least(8, (length(text) + 63) // 64) AS nf
  FROM documents
),
steps AS (
  SELECT media_id, nf, i.i AS fidx,
         substr(text, CAST((i.i - 1) * 64 + 1 AS INT), 64) AS prev_f,
         substr(text, CAST(i.i * 64 + 1 AS INT), 64) AS cur_f
  FROM f, LATERAL unnest(range(1, greatest(nf, 1))) i(i)
),
sads AS (
  SELECT media_id, nf,
         list_sum(list_transform(
           range(1, least(length(prev_f), length(cur_f)) + 1),
           j -> abs(unicode(substr(prev_f, CAST(j AS INT), 1))
                    - unicode(substr(cur_f, CAST(j AS INT), 1)))
         )) AS sad
  FROM steps
)
SELECT f.media_id, f.nf::BIGINT AS n_frames,
       coalesce(sum(s.sad), 0)::BIGINT AS total_motion,
       coalesce(max(s.sad), 0)::BIGINT AS max_step_motion
FROM f LEFT JOIN sads s USING (media_id)
GROUP BY f.media_id, f.nf
ORDER BY media_id"""


# ---------------------------------------------------------------------------
# tx40 — hapax legomena ratio per language
# ---------------------------------------------------------------------------


def tx40_hapax_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """(lang, n_tokens, vocab, hapax, dis, hapax_e6): per-language
    vocabulary richness — hapax = terms with corpus frequency 1 inside
    the language, dis = frequency 2; hapax_e6 their vocab share."""
    from bioeco_portal_etl_spark.text.tokenize import tokens

    d = T(spark, sf, "documents").select(
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.explode(tokens("text")).alias("tok"),
    )
    tc = d.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        tc.groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum((F.col("c") == 1).cast("long")).cast("long").alias("hapax"),
            F.sum((F.col("c") == 2).cast("long")).cast("long").alias("dis"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))"
                " div count(1) AS BIGINT)"
            ).alias("hapax_e6"),
        )
        .orderBy("lang")
    )


def _tx40_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH tc AS (
  SELECT lang, tok, count(*)::BIGINT AS c FROM (
    SELECT coalesce(lang, 'und') AS lang,
           unnest({duck_tokens("text")}) AS tok
    FROM documents)
  GROUP BY lang, tok
)
SELECT lang, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
       sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
       sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS dis,
       CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS hapax_e6
FROM tc GROUP BY lang ORDER BY lang"""


CATALOG_EXT29 = {
    "td14_dedupe_agreement": (td14_dedupe_agreement, _td14_sql()),
    "x48_top_movers": (x48_top_movers, _x48_sql()),
    "rel37_top_paths": (rel37_top_paths, _rel37_sql()),
    "mm21_frame_motion": (mm21_frame_motion, _mm21_sql()),
    "tx40_hapax_ratio": (tx40_hapax_ratio, _tx40_sql()),
}
