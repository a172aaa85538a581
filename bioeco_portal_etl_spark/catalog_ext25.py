"""Round-6 catalog extensions, fifth batch — 5 entries:

- tx37_bpe_fertility: tokens-per-word of the corpus-trained BPE
  tokenizer, rolled up per language — THE tokenizer-equity metric
  multilingual LLM teams track (high fertility = a language pays more
  compute per word);
- x45_bitmap_estimate: bitmap/RLE suitability audit (ndv, runs under
  physical order, RLE ratio) for low-cardinality order columns
  (operators/bitmapidx.py);
- td13_shard_dup_locality: duplicate pairs classified intra- vs
  inter-shard from group sizes alone (text/dedupe.py
  shard_dup_locality) — the number that justifies the global dedupe
  shuffle;
- gr19_rich_club: φ(k) hub-density curve over the co-order supplier
  graph (graph/richclub.py);
- w20_stream_union_dedupe: LIVE two-source streaming union with native
  dropDuplicates — multi-path ingest collapsing the overlap region
  exactly once (the exactly-once-ingest shape).

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# tx37 — BPE fertility per language
# ---------------------------------------------------------------------------


def tx37_bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Train 2 BPE merges (the tx21/tx24 loop), encode every word, and
    roll subtoken-per-word fertility up PER LANGUAGE: (lang, n_docs,
    n_words, n_subtokens, fertility_e4). The vocab is Heaps-bounded so
    the encode join broadcasts; fertility_e4 = (1e4·subtokens) div
    words."""
    from bioeco_portal_etl_spark.text.bpe import (
        apply_merge,
        pair_counts,
        top_merge,
        with_spaced,
        word_frequencies,
    )

    docs = T(spark, sf, "documents")
    wf = with_spaced(word_frequencies(docs, "text"))
    m1 = apply_merge(wf, top_merge(pair_counts(wf))).select(
        "w", "cnt", "spaced"
    )
    m2 = apply_merge(m1, top_merge(pair_counts(m1))).select("w", "spaced")
    vocab = m2.select(
        "w", F.size(F.split("spaced", " ")).cast("long").alias("n_sub")
    )
    # the BPE family tokenizes words on non-LETTERS (bpe.py
    # word_frequencies) — not the [^a-z0-9]+ TOKEN_SPLIT — so the
    # document-side explode must match or digit-bearing tokens would
    # silently drop in the vocab join
    tok = docs.select(
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.col("doc_id"),
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")
    enc = tok.join(F.broadcast(vocab), "w")
    per_doc = enc.groupBy("lang", "doc_id").agg(
        F.count(F.lit(1)).alias("words"), F.sum("n_sub").alias("subs")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("n_words"),
            F.sum("subs").cast("long").alias("n_subtokens"),
            F.expr(
                "CAST((10000 * sum(subs)) div sum(words) AS BIGINT)"
            ).alias("fertility_e4"),
        )
        .orderBy("lang")
    )


def _tx37_sql() -> str:
    # reuse the PROVEN tx24 oracle's merge/vocab CTE chain verbatim
    # (driver-green since round 5), swapping only the consumption head:
    # per-(lang, doc) encode rollup instead of per-doc counts
    from bioeco_portal_etl_spark.catalog_ext8 import TX24_SQL

    marker = "tok AS ("
    assert marker in TX24_SQL, "tx24 oracle shape changed"
    prefix = TX24_SQL.split(marker)[0]
    return f"""{prefix}tok AS (
  SELECT lang, doc_id, w FROM (
    SELECT coalesce(lang, 'und') AS lang, doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE w <> ''
),
per_doc AS (
  SELECT t.lang, t.doc_id, count(*)::BIGINT AS words,
         sum(v.n_sub)::BIGINT AS subs
  FROM tok t JOIN vocab v USING (w)
  GROUP BY t.lang, t.doc_id
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(words)::BIGINT AS n_words,
       sum(subs)::BIGINT AS n_subtokens,
       CAST((10000 * sum(subs)) // sum(words) AS BIGINT) AS fertility_e4
FROM per_doc GROUP BY lang ORDER BY lang"""


# ---------------------------------------------------------------------------
# x45 — bitmap/RLE suitability audit
# ---------------------------------------------------------------------------


def x45_bitmap_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """RLE/bitmap suitability of the low-cardinality orders columns
    under o_orderkey physical order — operators/bitmapidx.py."""
    from bioeco_portal_etl_spark.operators.bitmapidx import bitmap_suitability

    o = T(spark, sf, "orders")
    return bitmap_suitability(
        o, "o_orderkey", ["o_orderstatus", "o_orderpriority"]
    ).orderBy("column_name")


def _x45_sql() -> str:
    from bioeco_portal_etl_spark.operators.bitmapidx import (
        duck_bitmap_suitability,
    )

    body = duck_bitmap_suitability(
        "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders",
        "o_orderkey",
        ["o_orderstatus", "o_orderpriority"],
    )
    return f"""
SELECT * FROM ({body}) ORDER BY column_name"""


# ---------------------------------------------------------------------------
# td13 — shard dup locality
# ---------------------------------------------------------------------------


def td13_shard_dup_locality(spark: SparkSession, sf: str) -> DataFrame:
    """Intra- vs inter-shard duplicate pairs (shard = doc_id mod 8) per
    cluster size, from the prefix-fingerprint clusters — text/dedupe.py
    shard_dup_locality. Pair counts come from group sizes; no pair is
    ever enumerated."""
    from bioeco_portal_etl_spark.text.dedupe import shard_dup_locality

    d = T(spark, sf, "documents").select(
        "doc_id",
        F.md5(F.substring(F.coalesce("text", F.lit("")), 1, 100)).alias("fp"),
    )
    return shard_dup_locality(d, "doc_id", "fp", n_shards=8).orderBy(
        "cluster_size"
    )


def _td13_sql() -> str:
    from bioeco_portal_etl_spark.text.dedupe import duck_shard_dup_locality

    body = duck_shard_dup_locality(
        "SELECT doc_id AS id,"
        " md5(substr(coalesce(text, ''), 1, 100)) AS fp FROM documents",
        n_shards=8,
    )
    return f"""
WITH {body}
SELECT cluster_size, n_clusters, intra_pairs, inter_pairs, inter_share_e6
FROM sdl ORDER BY cluster_size"""


# ---------------------------------------------------------------------------
# gr19 — rich-club coefficient
# ---------------------------------------------------------------------------


def gr19_rich_club(spark: SparkSession, sf: str) -> DataFrame:
    """φ(k) for k in {2, 4, 8, 16} over the 1%-slice co-order supplier
    graph (the gr2/gr18 fixture) — graph/richclub.py."""
    from bioeco_portal_etl_spark.catalog_ext22 import _coorder_edges
    from bioeco_portal_etl_spark.graph.richclub import rich_club

    return rich_club(_coorder_edges(spark, sf), ks=[2, 4, 8, 16]).orderBy("k")


def _gr19_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext22 import _COORDER_SQL
    from bioeco_portal_etl_spark.graph.richclub import duck_rich_club

    body = duck_rich_club(_COORDER_SQL, ks=[2, 4, 8, 16])
    return f"""
WITH {body}
SELECT k, n_nodes, n_edges, phi_e6 FROM rc ORDER BY k"""


# ---------------------------------------------------------------------------
# w20 — LIVE streaming union of two sources + native dropDuplicates
# ---------------------------------------------------------------------------


def w20_stream_union_dedupe(spark: SparkSession, sf: str) -> DataFrame:
    """Two overlapping document streams (doc_id < 300 and doc_id >= 200
    — the 200-299 region arrives on BOTH paths) unioned and collapsed
    with NATIVE streaming dropDuplicates on doc_id, drained with
    availableNow — the exactly-once multi-path ingest shape (a backfill
    path racing the live path). The oracle is the distinct union. State
    is one key per doc id; with an event-time watermark the store
    ages out — unbounded only for this drain-once harness."""
    from bioeco_portal_etl_spark.streaming import scoped_shuffle_partitions

    T(spark, sf, "documents")  # pins session confs like the other readers
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    path = os.path.join(sf, "documents.parquet*")
    a = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("doc_id") < 300)
    )
    b = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("doc_id") >= 200)
    )
    merged = a.unionByName(b).select("doc_id", "lang")
    with scoped_shuffle_partitions(spark, 8):
        q = (
            merged.dropDuplicates(["doc_id"])
            .writeStream.format("memory")
            .queryName("w20_union_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            ok = q.awaitTermination(300)
        finally:
            q.stop()
        if not ok:  # pragma: no cover
            raise RuntimeError("w20 stream did not drain")
    return spark.table("w20_union_mem").orderBy("doc_id")


W20_SQL = """
SELECT DISTINCT doc_id, lang FROM documents
WHERE doc_id < 300 OR doc_id >= 200
ORDER BY doc_id
"""


CATALOG_EXT25 = {
    "tx37_bpe_fertility": (tx37_bpe_fertility, _tx37_sql()),
    "x45_bitmap_estimate": (x45_bitmap_estimate, _x45_sql()),
    "td13_shard_dup_locality": (td13_shard_dup_locality, _td13_sql()),
    "gr19_rich_club": (gr19_rich_club, _gr19_sql()),
    "w20_stream_union_dedupe": (w20_stream_union_dedupe, W20_SQL),
}
