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


ANNOTATION_COLS = (
    "n_chars", "n_tokens", "mean_word_len", "punct_ratio", "stopword_ratio",
    "quality", "fingerprint", "lang_pred",
)


def annotate_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality features + composite score + predicted language + fingerprint,
    joined back onto the input columns in ONE id-join (the annotation side
    computes all families off a single projection; broadcast at dim scale,
    co-partitioned hash join at corpus scale).

    Input columns whose names collide with annotations (e.g. a raw-source
    ``n_chars``) are dropped first — the recomputed post-normalization
    values are the authoritative ones; keeping both would leave an ambiguous
    duplicate column."""
    clashes = [c for c in ANNOTATION_COLS if c in df.columns]
    base = df.drop(*clashes)
    src = base.select(F.col(id_col), F.col(text_col))
    ann = (
        quality_table(src, id_col, text_col)
        .join(fingerprint_table(src, id_col, text_col), id_col)
        .join(
            src.select(F.col(id_col), language_id(text_col).alias("lang_pred")),
            id_col,
        )
    )
    return base.join(ann, id_col)


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en", "es", "de", "fr"),
    min_quality: float = 0.1,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    jaccard_threshold: float = 0.8,
    staging_dir: str | None = None,
    benchmark: DataFrame | None = None,
    decontam_min_common: int = 2,
    history: DataFrame | None = None,
    history_fpp: float = 0.001,
    chunk_size: int | None = None,
    chunk_stride: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Full curation pass. Returns (curated DataFrame, funnel counts).

    The funnel dict is materialized eagerly (one count per stage) — that is
    the operational contract of a curation run: you always report how many
    documents each gate removed. Stage boundaries are persisted so each
    count (and the returned frame) reuses upstream work instead of
    re-running the scan+annotate+dedupe pipeline per action; the returned
    DataFrame keeps its final stage persisted — callers at true scale
    should write it out and then spark.catalog.clearCache().

    ``staging_dir`` routes the near-dedupe's shared shingle stage to a
    parquet staging table instead of an in-memory persist (the 100 TB
    path); without it the stage is persisted and unpersisted here once the
    funnel count has materialized it.

    ``history`` enables the incremental gate: batch docs whose exact content
    already exists in the history corpus are dropped via a Bloom filter
    (text/incremental.py) — one scan of history, no history shuffle, no
    false negatives. ``chunk_size``/``chunk_stride`` append the
    context-window chunking stage (text/chunking.py): the returned frame
    then has one row per (doc, window) — the training-unit shape."""
    funnel = {"input": df.count()}

    norm = normalize_documents(df, text_col)

    if history is not None:
        from bioeco_portal_etl_spark.text.incremental import (
            bloom_build,
            bloom_new_docs,
            bloom_params,
        )

        hist_norm = normalize_documents(
            history.select(F.col(id_col), F.col(text_col)), text_col
        )
        m, k = bloom_params(max(hist_norm.count(), 1), history_fpp)
        bloom = bloom_build(hist_norm, text_col, m, k)
        norm = bloom_new_docs(norm, bloom, id_col, text_col, m, k)
        funnel["after_history_dedupe"] = norm.count()

    ann = annotate_documents(norm, id_col, text_col)

    filtered = ann.filter(
        F.col("lang_pred").isin(*allowed_langs)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens").between(min_tokens, max_tokens))
    ).persist()
    funnel["after_filters"] = filtered.count()

    exact = exact_dedupe(filtered, id_col, text_col).filter(~F.col("is_duplicate"))
    kept_exact = filtered.join(exact.select(id_col), id_col, "left_semi").persist()
    funnel["after_exact_dedupe"] = kept_exact.count()
    filtered.unpersist()

    handles: list[DataFrame] = []
    pairs = ngram_jaccard_pairs(
        kept_exact,
        id_col,
        text_col,
        threshold=jaccard_threshold,
        staging_path=f"{staging_dir}/shingles" if staging_dir else None,
        stage_handles=handles,
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    curated = kept_exact.join(drop, id_col, "left_anti").persist()
    funnel["after_near_dedupe"] = curated.count()
    kept_exact.unpersist()
    for h in handles:  # shingle stage fully consumed once curated counted
        h.unpersist()

    if benchmark is not None:
        from bioeco_portal_etl_spark.text.decontam import decontaminate

        prev = curated
        curated = decontaminate(
            prev, benchmark, id_col, text_col, min_common=decontam_min_common
        ).persist()
        funnel["after_decontamination"] = curated.count()
        prev.unpersist()

    if chunk_size is not None:
        from bioeco_portal_etl_spark.text.chunking import chunk_windows

        prev = curated
        curated = chunk_windows(
            prev,
            id_col,
            text_col,
            chunk_size=chunk_size,
            stride=chunk_stride or chunk_size,
        ).persist()
        funnel["chunks"] = curated.count()
        prev.unpersist()

    return curated, funnel
