"""TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank over
per-document word co-occurrence graphs, entirely relational.

The classic formulation builds, for EACH document, a graph whose nodes
are content words and whose edges connect words co-occurring within a
sliding window, then ranks nodes by PageRank; the top-ranked words are
the document's keywords. A driver-side loop per document would be the
obvious (and wrong) implementation — this module instead runs ONE
grouped PageRank over the whole corpus at once by adding ``doc_id`` to
every key:

    edges    (doc_id, src, dst)           one exploded array transform
    outdeg   groupBy(doc_id, src)         partial-combinable count
    n        count over (doc_id)          per-doc node count
    iterate  join on (doc_id, src) + groupBy(doc_id, dst)

so a 100 TB corpus is k fixed supersteps of ordinary hash joins — the
same two-shuffle Pregel lowering as graph/pagerank.py, with the doc id
riding along in the shuffle key (uniformly distributed: per-doc graphs
are tiny, so there is no skew for a single hot document to create).

Fixed-point contract (identical to graph/pagerank.py — see its module
docstring for the overflow/rounding analysis): ranks in e9 integers,
damping 85/100 as an exact rational, integer division throughout, so
the unrolled DuckDB mirror reproduces every rank bit-exactly.

Co-occurrence definition pinned here (and mirrored in
:func:`duck_textrank_edges`): tokens are ``text.tokenize.tokens`` with
length >= ``min_len`` kept, the window is ADJACENT surviving tokens
(window = 2 on the filtered sequence — TextRank's default), edges are
undirected (both directions materialized) and deduplicated per doc.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from bioeco_portal_etl_spark.graph.pagerank import DAMP_DEN, DAMP_NUM, E9
from bioeco_portal_etl_spark.text.tokenize import TOKEN_SPLIT, tokens


def cooccurrence_edges(
    docs: DataFrame, id_col: str, text_col: str, min_len: int = 4
) -> DataFrame:
    """(doc_id, src, dst): undirected deduped adjacency of consecutive
    length->= ``min_len`` tokens. One array pipeline + one explode — the
    pair construction never leaves the scan stage."""
    arr = F.filter(tokens(text_col), lambda t: F.length(t) >= min_len)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 1),
        lambda i: F.struct(
            F.element_at(arr, i).alias("src"),
            F.element_at(arr, i + 1).alias("dst"),
        ),
    )
    fwd = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.when(F.size(arr) >= 2, pairs).otherwise(
                    F.array().cast("array<struct<src:string,dst:string>>")
                )
            ).alias("p"),
        )
        .select("doc_id", "p.src", "p.dst")
        .filter(F.col("src") != F.col("dst"))
    )
    return fwd.unionByName(
        fwd.select("doc_id", F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def textrank_keywords(
    edges: DataFrame, iterations: int = 2, k: int = 3
) -> DataFrame:
    """Grouped e9 fixed-point PageRank over (doc_id, word) and the top-k
    words per document: (doc_id, rank, word, pr_e9).

    Nodes are edge endpoints (a word with no surviving neighbor can't be
    ranked against anything). Per-doc graphs are symmetric by
    construction, so there are no dangling nodes and rank mass stays
    bounded (graph/pagerank.py's analysis applies per doc)."""
    e = edges.select("doc_id", "src", "dst").distinct().repartition("doc_id")
    outdeg = e.groupBy("doc_id", "src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select("doc_id", F.col("src").alias("word"))
        .distinct()
        .join(
            outdeg.withColumnRenamed("src", "word"), ["doc_id", "word"]
        )
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .persist()
    )
    ranks = nodes.select(
        "doc_id", "word", "outdeg", "n", F.expr(f"{E9} div n").alias("pr_e9")
    )
    teleport = (DAMP_DEN - DAMP_NUM) * E9 // DAMP_DEN
    for _ in range(iterations):
        contribs = e.join(
            ranks.withColumnRenamed("word", "src"), ["doc_id", "src"]
        ).select(
            "doc_id",
            F.col("dst").alias("word"),
            F.expr(f"({DAMP_NUM} * pr_e9) div ({DAMP_DEN} * outdeg)").alias(
                "c"
            ),
        )
        sums = contribs.groupBy("doc_id", "word").agg(
            F.sum("c").alias("in_mass")
        )
        ranks = nodes.join(sums, ["doc_id", "word"], "left").select(
            "doc_id",
            "word",
            "outdeg",
            "n",
            (
                F.expr(f"{teleport} div n")
                + F.coalesce(F.col("in_mass"), F.lit(0))
            ).alias("pr_e9"),
        )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("pr_e9").desc(), F.col("word")
    )
    return (
        ranks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("long").alias("rank"), "word", "pr_e9")
    )


def duck_textrank(
    docs_select: str, iterations: int = 2, k: int = 3, min_len: int = 4
) -> str:
    """DuckDB CTE body mirroring edges + grouped PageRank + top-k;
    exposes ``tr(doc_id, rank, word, pr_e9)``. ``docs_select`` must
    project ``doc_id, text``."""
    teleport = (DAMP_DEN - DAMP_NUM) * E9 // DAMP_DEN
    arr = (
        f"list_filter(list_filter(string_split_regex(lower(text),"
        f" '{TOKEN_SPLIT}'), t -> t <> ''), t -> length(t) >= {min_len})"
    )
    parts = [
        f"__tr_docs AS ({docs_select})",
        f"__tr_arr AS (SELECT doc_id, {arr} AS a FROM __tr_docs)",
        """__tr_fwd AS (
  SELECT doc_id, p.src AS src, p.dst AS dst
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a)),
                                 i -> {src: a[i], dst: a[i + 1]})) AS p
    FROM __tr_arr WHERE len(a) >= 2
  ) WHERE p.src <> p.dst
)""",
        """__tr_e AS (
  SELECT DISTINCT doc_id, src, dst FROM (
    SELECT doc_id, src, dst FROM __tr_fwd
    UNION ALL SELECT doc_id, dst AS src, src AS dst FROM __tr_fwd
  )
)""",
        """__tr_odeg AS (
  SELECT doc_id, src, count(*) AS outdeg FROM __tr_e GROUP BY doc_id, src
)""",
        """__tr_nodes AS (
  SELECT doc_id, src AS word, outdeg,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM __tr_odeg
)""",
        f"""__tr_pr0 AS (
  SELECT doc_id, word, outdeg, n, {E9} // n AS pr_e9 FROM __tr_nodes
)""",
    ]
    for i in range(iterations):
        parts.append(
            f"""__tr_s{i} AS (
  SELECT e.doc_id, e.dst AS word,
         CAST(sum(({DAMP_NUM} * r.pr_e9) // ({DAMP_DEN} * r.outdeg))
              AS BIGINT) AS in_mass
  FROM __tr_e e
  JOIN __tr_pr{i} r ON r.doc_id = e.doc_id AND r.word = e.src
  GROUP BY e.doc_id, e.dst
),
__tr_pr{i + 1} AS (
  SELECT nd.doc_id, nd.word, nd.outdeg, nd.n,
         {teleport} // nd.n + coalesce(s.in_mass, 0) AS pr_e9
  FROM __tr_nodes nd
  LEFT JOIN __tr_s{i} s ON s.doc_id = nd.doc_id AND s.word = nd.word
)"""
        )
    parts.append(
        f"""tr AS (
  SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, pr_e9 FROM (
    SELECT doc_id, word, pr_e9,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY pr_e9 DESC, word) AS rank
    FROM __tr_pr{iterations}
  ) WHERE rank <= {k}
)"""
    )
    return ",\n".join(parts)
