"""Document-curation pipeline: the training-data counterpart of
pipelines/programs.py — composes the text/similarity operator families into
the standard corpus-preparation dataflow:

    raw documents
      -> normalize (tx5 chain)
      -> annotate: language, quality, token counts, fingerprint
      -> filter: language allowlist + quality floor + length band
      -> exact dedupe (content-hash, keep min id)
      -> near-dedupe (MinHash-LSH candidates -> Jaccard >= threshold,
         drop the higher id of each verified pair)
      -> curated corpus + a per-stage funnel report

Every stage is the already-oracle-checked operator; this module adds only
composition. Plan shape: normalization/annotation fuse into the scan
stage (one pass, codegen); the dedupe stages add the two MinHash shuffles;
the funnel report is a cheap count per stage boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bioeco_portal_etl_spark.text.analysis import (
    fingerprint_table,
    language_id,
    quality_table,
)
from bioeco_portal_etl_spark.text.dedupe import exact_dedupe, ngram_jaccard_pairs


def normalize_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tag-strip + whitespace-collapse + trim, in place."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), r"<[^>]{1,100}>", " "), r"\s+", " "
        )
    )
    return df.withColumn(text_col, cleaned)


def annotate_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality features + composite score + predicted language + fingerprint,
    joined back onto the input columns (the joins are on the id — broadcast
    at dim scale, co-partitioned hash join at corpus scale)."""
    q = quality_table(df, id_col, text_col)
    fp = fingerprint_table(df, id_col, text_col)
    lang = df.select(F.col(id_col), language_id(text_col).alias("lang_pred"))
    return df.join(q, id_col).join(fp, id_col).join(lang, id_col)


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en", "es", "de", "fr"),
    min_quality: float = 0.1,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    jaccard_threshold: float = 0.8,
) -> tuple[DataFrame, dict[str, int]]:
    """Full curation pass. Returns (curated DataFrame, funnel counts).

    The funnel dict is materialized eagerly (one count per stage) — that is
    the operational contract of a curation run: you always report how many
    documents each gate removed."""
    funnel = {"input": df.count()}

    norm = normalize_documents(df, text_col)
    ann = annotate_documents(norm, id_col, text_col)

    filtered = ann.filter(
        F.col("lang_pred").isin(*allowed_langs)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens").between(min_tokens, max_tokens))
    )
    funnel["after_filters"] = filtered.count()

    exact = exact_dedupe(filtered, id_col, text_col).filter(~F.col("is_duplicate"))
    kept_exact = filtered.join(exact.select(id_col), id_col, "left_semi")
    funnel["after_exact_dedupe"] = kept_exact.count()

    pairs = ngram_jaccard_pairs(
        kept_exact, id_col, text_col, threshold=jaccard_threshold
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    curated = kept_exact.join(drop, id_col, "left_anti")
    funnel["after_near_dedupe"] = curated.count()

    return curated, funnel
