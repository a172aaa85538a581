"""Cross-document repeated n-gram coverage (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the coverage diagnostic).

For each document: the fraction of its token positions covered by at
least one k-gram that also appears in other documents. High coverage
means the document is largely assembled from corpus-repeated spans —
boilerplate, templates, near-dup fragments below the document-level
dedup threshold — and is both a memorization risk and low-value
training signal. Complements tx9 (WITHIN-doc repetition) and tx19
(line-level boilerplate): this one measures ACROSS-doc span reuse at
sub-document granularity.

Exact-integer surface: coverage_e6 = (1e6 * covered_positions) div
n_tokens; a position j is covered iff some common k-gram starts in
[j-k+1, j]. Covered-position counting is the interval union of [s, s+k-1]
per common gram start — equal-width intervals over per-doc-unique sorted
starts, so the union is a lag-window run merge (k + min(k, gap) per
start), one shuffle per doc key instead of the k-times position explode
+ distinct the round-5 form paid.

Scale shape: one token explode into (doc, start, gram) rows; gram
document-frequency is a partial-aggregated groupBy(gram); the common-gram
set joins back as an equi-join on the gram string (shuffle co-partitioned
both sides). At 100 TB the df table is vocabulary-scale (Heaps-bounded),
and the candidate cut from ``min_df`` happens BEFORE the position
explosion, so only repeated spans pay the k-times blowup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from bioeco_portal_etl_spark.text.tokenize import duck_tokens, tokens


def ngram_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """(id, n_tokens, covered, coverage_e6) per document; a k-gram is
    "common" when it appears in >= ``min_df`` DISTINCT documents.

    Round-12 (guide §1.2/§2.3): the (id, n_tokens, gram-array) projection
    is persisted, so the tokenize + per-position array_join gram build —
    the dominant per-row cost — runs ONCE. The previous lazy form
    evaluated it three times: once per consumer branch (df aggregate,
    coverage join-back) and a third time inside the size()>0 filter
    Catalyst infers below the explode (InferFiltersFromGenerate +
    PushDownPredicate inline the whole gram expression into the
    predicate; a cached array makes that filter a size() probe)."""
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.when(
            F.size("__toks") >= k,
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - k),
                lambda s: F.struct(
                    s.cast("long").alias("s"),
                    F.array_join(
                        F.slice(F.col("__toks"), s + 1, k), " "
                    ).alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<s:long,g:string>>"))
        .alias("__grams"),
    ).persist()
    grams = toked.select(
        id_col, F.explode("__grams").alias("__sg")
    ).select(id_col, F.col("__sg.s").alias("__s"), F.col("__sg.g").alias("__g"))

    common = (
        grams.groupBy("__g")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("__g")
    )
    # Interval union of the k-wide spans [s, s+k-1] per doc. Gram starts
    # are UNIQUE within a doc (one gram per position), so with starts
    # sorted the union is k for the first run plus min(k, gap) per
    # subsequent start — a lag window per doc replaces the round-5
    # explode(k)+distinct form (which paid a k-times row blowup and an
    # extra distinct shuffle for the same number). The window partitions
    # by doc id, so no global sort; per-partition state is one doc's
    # common-gram starts, bounded by doc length.
    w = Window.partitionBy(id_col).orderBy("__s")
    covered = (
        grams.join(common, "__g")
        .select(id_col, "__s")
        .withColumn("__gap", F.col("__s") - F.lag("__s").over(w))
        .select(
            id_col,
            F.when(F.col("__gap").isNull(), F.lit(k))
            .otherwise(F.least(F.lit(k), F.col("__gap")))
            .alias("__c"),
        )
        .groupBy(id_col)
        .agg(F.sum("__c").alias("covered"))
    )
    return (
        toked.select(id_col, "n_tokens")
        .join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("covered"), F.lit(0)).cast("long").alias("covered"),
            F.expr(
                "CASE WHEN n_tokens > 0 THEN"
                " (1000000 * coalesce(covered, 0)) div n_tokens"
                " ELSE 0 END"
            ).cast("long").alias("coverage_e6"),
        )
    )


def duck_ngram_coverage_sql(
    source_sql: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_df: int = 2,
) -> str:
    """DuckDB mirror (CTE chain ending in ``ngcov``); caller selects from
    ``ngcov`` and appends ORDER BY."""
    return f"""
ctok AS (
  SELECT {id_col}, {duck_tokens(text_col)} AS __toks
  FROM ({source_sql})
),
cbase AS (
  SELECT {id_col}, len(__toks)::BIGINT AS n_tokens,
         CASE WHEN len(__toks) >= {k} THEN
           list_transform(range(0, len(__toks) - {k} + 1),
             s -> struct_pack(s := s::BIGINT,
                    g := array_to_string(list_slice(__toks, s + 1, s + {k}), ' ')))
         ELSE [] END AS __grams
  FROM ctok
),
cgrams AS (
  SELECT {id_col}, u.s AS __s, u.g AS __g
  FROM (SELECT {id_col}, unnest(__grams) AS u FROM cbase)
),
ccommon AS (
  SELECT __g FROM cgrams
  GROUP BY __g HAVING count(DISTINCT {id_col}) >= {min_df}
),
ccov AS (
  SELECT {id_col}, count(*)::BIGINT AS covered FROM (
    SELECT DISTINCT {id_col}, __s + x AS __j
    FROM cgrams JOIN ccommon USING (__g), range(0, {k}) t(x)
  ) GROUP BY {id_col}
),
ngcov AS (
  SELECT b.{id_col}, b.n_tokens,
         coalesce(c.covered, 0)::BIGINT AS covered,
         (CASE WHEN b.n_tokens > 0
               THEN (1000000 * coalesce(c.covered, 0)) // b.n_tokens
               ELSE 0 END)::BIGINT AS coverage_e6
  FROM cbase b LEFT JOIN ccov c USING ({id_col})
)"""
