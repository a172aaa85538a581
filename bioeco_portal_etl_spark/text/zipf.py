"""Zipf's-law fit over the corpus frequency spectrum — the one-number
summary of vocabulary shape (slope ~ -1 for natural language; flatter
means templated/duplicated text, steeper means vocabulary collapse), a
standard corpus-QA statistic next to tx12's vocab growth and tx15's
token entropy.

Method: top-K terms by frequency, then ordinary least squares on
(ln rank, ln freq). Two scale decisions make this corpus-safe:

- the top-K cut is ``orderBy().limit(K)`` — TakeOrderedAndProject, a
  per-partition heap + driver merge of K rows, never a global sort of
  the (vocabulary-sized) frequency table; the subsequent rank window
  runs over K rows only;
- the OLS sufficient statistics are summed as INTEGERS: ln values are
  floor-quantized to e4 first (transcendentals inside a floor-e4 — the
  PORTABILITY.md rule), so Sx/Sy/Sxy/Sxx are exact and order-independent
  where raw double sums would drift per partitioning. One IEEE division
  closes the slope inside a floor (the rolling_slope pattern).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from bioeco_portal_etl_spark.text.tokenize import TOKEN_SPLIT, tokens


def zipf_fit(
    docs: DataFrame, text_col: str, top_k: int = 1000, min_len: int = 1
) -> DataFrame:
    """One row: (n_terms, n_tokens, top1_share_e6, slope_e6) — the
    log-log OLS slope over the top-``top_k`` terms."""
    arr = F.filter(tokens(text_col), lambda t: F.length(t) >= min_len)
    freq = (
        docs.select(F.explode(arr).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = freq.orderBy(F.col("cnt").desc(), F.col("term")).limit(top_k)
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("cnt").desc(), F.col("term")
    )
    ranked = top.select(
        F.row_number().over(w).cast("long").alias("rank"), "cnt"
    ).select(
        "rank",
        "cnt",
        F.floor(F.log(F.col("rank").cast("double")) * 10000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 10000)
        .cast("long")
        .alias("y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("n_tokens"),
        F.max(F.when(F.col("rank") == 1, F.col("cnt"))).alias("top1"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = F.floor(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1_000_000
    ).cast("long")
    return agg.select(
        F.col("n").cast("long").alias("n_terms"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr("CAST((1000000 * top1) div n_tokens AS BIGINT)").alias(
            "top1_share_e6"
        ),
        slope.alias("slope_e6"),
    )


def duck_zipf(docs_select: str, top_k: int = 1000, min_len: int = 1) -> str:
    """DuckDB CTE body mirroring :func:`zipf_fit`; exposes
    ``zipf(n_terms, n_tokens, top1_share_e6, slope_e6)``.
    ``docs_select`` must project (text)."""
    arr = (
        f"list_filter(list_filter(string_split_regex(lower(text),"
        f" '{TOKEN_SPLIT}'), t -> t <> ''), t -> length(t) >= {min_len})"
    )
    return f"""__zf_docs AS ({docs_select}),
__zf_freq AS (
  SELECT term, count(*) AS cnt
  FROM (SELECT unnest({arr}) AS term FROM __zf_docs)
  GROUP BY term
),
__zf_top AS (
  SELECT term, cnt FROM __zf_freq ORDER BY cnt DESC, term LIMIT {top_k}
),
__zf_ranked AS (
  SELECT row_number() OVER (ORDER BY cnt DESC, term) AS rank, cnt
  FROM __zf_top
),
__zf_pts AS (
  SELECT rank, cnt,
         CAST(floor(ln(CAST(rank AS DOUBLE)) * 10000) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 10000) AS BIGINT) AS y
  FROM __zf_ranked
),
__zf_agg AS (
  SELECT count(*) AS n, sum(cnt) AS n_tokens,
         max(CASE WHEN rank = 1 THEN cnt END) AS top1,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM __zf_pts
),
zipf AS (
  SELECT CAST(n AS BIGINT) AS n_terms,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST((1000000 * top1) // n_tokens AS BIGINT) AS top1_share_e6,
         CAST(floor((n * sxy - sx * sy)
              / (n * sxx - sx * sx) * 1000000) AS BIGINT) AS slope_e6
  FROM __zf_agg
)"""
