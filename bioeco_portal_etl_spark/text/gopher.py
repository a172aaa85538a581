"""Gopher-style rule-based document filtering (Rae et al. 2021, §A1.1).

The published quality pipeline most LLM corpora start from: a document
survives only if it passes EVERY structural rule (word-count band, mean
word length band, symbol-to-word ratio cap, alphabetic-word floor,
required-stopword floor). tx3's composite score ranks documents; this is
the hard FILTER face — per-rule boolean columns plus the conjunction, so
a curation run can report exactly which rule killed each document.

All surfaces are engine-exact integers (counts, e2/e6 integer-division
ratios, 0/1 flags): no doubles anywhere, so the DuckDB oracle mirror
(:func:`duck_gopher_sql`) hashes byte-identically. Pure Column algebra —
at 100 TB the whole rule stack runs inside the scan stage's codegen span
(one pass over the text, token array materialized once via a layered
select, the CollapseProject idiom from text/dedupe.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Gopher's required-word list (Rae et al.: "contains at least 2 of ...").
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Rule thresholds. Word-count band and mean-word-length band are the
# published Gopher values; the stopword floor is 1 (not 2) because the
# synthetic corpus draws from a vocabulary where only "the" appears —
# a floor of 2 would be constant-false and test nothing.
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MWL_E2, MAX_MWL_E2 = 300, 1_000  # mean word length in [3, 10]
MAX_SYMBOL_E6 = 100_000              # '#'/'...' per word <= 0.1
MIN_ALPHA_E6 = 800_000               # >= 80% of words contain a letter
MIN_STOP_HITS = 1


def gopher_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Gopher rule table: raw signals, one 0/1 column per
    rule, and ``pass_all`` — the conjunction a filter stage applies.

    Layered selects keep the whitespace-token array materialized (it is
    referenced by four signals; inlining would re-split per reference —
    the measured-25x trap documented in text/dedupe.shingled)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))  # null text = empty text
    toks = F.filter(F.split(txt, r"\s+"), lambda t: t != "")
    base = df.select(
        F.col(id_col),
        txt.alias("__text"),
        toks.alias("__toks"),
    )
    low = F.transform(F.col("__toks"), F.lower)
    sig = base.select(
        id_col,
        F.size("__toks").cast("long").alias("n_words"),
        F.aggregate(
            F.col("__toks"), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).alias("__word_chars"),
        F.size(
            F.filter(F.col("__toks"), lambda t: F.lower(t).rlike("[a-z]"))
        ).cast("long").alias("__alpha_words"),
        sum(
            (
                F.when(F.array_contains(low, w), F.lit(1)).otherwise(F.lit(0))
                for w in GOPHER_STOPWORDS[1:]
            ),
            F.when(
                F.array_contains(low, GOPHER_STOPWORDS[0]), F.lit(1)
            ).otherwise(F.lit(0)),
        ).cast("long").alias("stop_hits"),
        (
            (F.length("__text") - F.length(F.replace(F.col("__text"), F.lit("#"))))
            + F.expr(
                "(length(__text) - length(replace(__text, '...', ''))) div 3"
            )
        ).cast("long").alias("__symbols"),
    )
    # All ratios are BIGINT `div` — no double division anywhere, so the
    # surface is bit-portable without a floor (PORTABILITY.md).
    rules = sig.select(
        id_col,
        "n_words",
        F.expr(
            "CASE WHEN n_words > 0 THEN (100 * __word_chars) div n_words"
            " ELSE 0 END"
        ).cast("long").alias("mwl_e2"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (1000000 * __alpha_words) div n_words"
            " ELSE 0 END"
        ).cast("long").alias("alpha_frac_e6"),
        "stop_hits",
        F.expr(
            "CASE WHEN n_words > 0 THEN (1000000 * __symbols) div n_words"
            " ELSE 0 END"
        ).cast("long").alias("symbol_e6"),
    )
    flag = lambda c: c.cast("long")  # noqa: E731 — 0/1 BIGINT, not boolean
    out = rules.select(
        id_col,
        "n_words",
        "mwl_e2",
        "alpha_frac_e6",
        "stop_hits",
        "symbol_e6",
        flag(F.col("n_words").between(MIN_WORDS, MAX_WORDS)).alias("r_words"),
        flag(F.col("mwl_e2").between(MIN_MWL_E2, MAX_MWL_E2)).alias("r_mwl"),
        flag(F.col("alpha_frac_e6") >= MIN_ALPHA_E6).alias("r_alpha"),
        flag(F.col("stop_hits") >= MIN_STOP_HITS).alias("r_stop"),
        flag(F.col("symbol_e6") <= MAX_SYMBOL_E6).alias("r_symbol"),
    )
    return out.withColumn(
        "pass_all",
        (
            F.col("r_words") * F.col("r_mwl") * F.col("r_alpha")
            * F.col("r_stop") * F.col("r_symbol")
        ).cast("long"),
    )


def duck_gopher_sql(source_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`gopher_flags` over ``source_sql`` (a
    parenthesizable SELECT). Emits the same columns; caller appends the
    ORDER BY."""
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
gtok AS (
  SELECT {id_col}, coalesce({text_col}, '') AS __text,
         list_filter(string_split_regex(coalesce({text_col}, ''), '\\s+'),
                     t -> t <> '') AS __toks
  FROM ({source_sql})
),
gsig AS (
  SELECT {id_col},
         len(__toks)::BIGINT AS n_words,
         coalesce(list_reduce(
           list_prepend(0::BIGINT, list_transform(__toks, t -> length(t)::BIGINT)),
           (a, b) -> a + b), 0)::BIGINT AS __word_chars,
         len(list_filter(__toks, t -> regexp_matches(lower(t), '[a-z]')))::BIGINT
           AS __alpha_words,
         len(list_filter([{stops}],
             w -> list_contains(list_transform(__toks, t -> lower(t)), w)))::BIGINT
           AS stop_hits,
         ((length(__text) - length(replace(__text, '#', '')))
          + (length(__text) - length(replace(__text, '...', ''))) // 3)::BIGINT
           AS __symbols
  FROM gtok
),
grules AS (
  SELECT {id_col}, n_words,
         (CASE WHEN n_words > 0 THEN (100 * __word_chars) // n_words
               ELSE 0 END)::BIGINT AS mwl_e2,
         (CASE WHEN n_words > 0 THEN (1000000 * __alpha_words) // n_words
               ELSE 0 END)::BIGINT AS alpha_frac_e6,
         stop_hits,
         (CASE WHEN n_words > 0 THEN (1000000 * __symbols) // n_words
               ELSE 0 END)::BIGINT AS symbol_e6
  FROM gsig
),
gopherr AS (
  SELECT {id_col}, n_words, mwl_e2, alpha_frac_e6, stop_hits, symbol_e6,
         (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})::BIGINT AS r_words,
         (mwl_e2 BETWEEN {MIN_MWL_E2} AND {MAX_MWL_E2})::BIGINT AS r_mwl,
         (alpha_frac_e6 >= {MIN_ALPHA_E6})::BIGINT AS r_alpha,
         (stop_hits >= {MIN_STOP_HITS})::BIGINT AS r_stop,
         (symbol_e6 <= {MAX_SYMBOL_E6})::BIGINT AS r_symbol,
         ((n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})::BIGINT
          * (mwl_e2 BETWEEN {MIN_MWL_E2} AND {MAX_MWL_E2})::BIGINT
          * (alpha_frac_e6 >= {MIN_ALPHA_E6})::BIGINT
          * (stop_hits >= {MIN_STOP_HITS})::BIGINT
          * (symbol_e6 <= {MAX_SYMBOL_E6})::BIGINT)::BIGINT AS pass_all
  FROM grules
)"""
