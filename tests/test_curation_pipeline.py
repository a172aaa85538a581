"""End-to-end curation pipeline: planted dirty/duplicate documents must fall
out at the right funnel stage."""

from __future__ import annotations

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.pipelines.curation import (
    annotate_documents,
    curate_documents,
    normalize_documents,
)
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE

BASE_TEXT = (
    "the data of a table is the value and the scan of a row is the part "
    "of a query and the join of a batch is the merge of a stream"
)


def _corpus(spark):
    rows = [
        (1, BASE_TEXT),
        (2, BASE_TEXT),  # exact duplicate of 1 -> exact-dedupe stage
        (3, BASE_TEXT + " with one extra tail clause appended here"),  # near-dup
        (4, "<p>" + BASE_TEXT + "</p>"),  # normalizes to exact dup of 1
        (5, "tiny"),  # under min_tokens
        (6, "zz qq xx vv ww yy kk jj"),  # no stopwords -> low quality + 'und'
        (7, "the quick brown fox jumps over the lazy dog and runs to the hills "
            "while the sun sets over the quiet bay and the boats drift home"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_strips_tags(spark):
    df = normalize_documents(_corpus(spark))
    t4 = df.filter(F.col("doc_id") == 4).collect()[0].text
    assert t4 == BASE_TEXT


def test_annotate_shapes(spark):
    ann = annotate_documents(_corpus(spark))
    cols = set(ann.columns)
    assert {"quality", "lang_pred", "fingerprint", "n_tokens"} <= cols
    assert ann.count() == 7


def test_curation_funnel(spark):
    curated, funnel = curate_documents(
        _corpus(spark), min_quality=0.05, jaccard_threshold=0.7
    )
    ids = sorted(r.doc_id for r in curated.collect())
    assert funnel["input"] == 7
    # 5 (too short) and 6 (no stopwords -> 'und' lang + low quality) gated
    assert funnel["after_filters"] == 5
    # 1,2,4 identical post-normalization -> keep min id 1
    assert funnel["after_exact_dedupe"] == 3
    # 3 is a near-dup of 1 (id_b dropped); 7 is genuinely different
    assert funnel["after_near_dedupe"] == 2
    assert ids == [1, 7]


def test_curation_on_synthetic_corpus(spark):
    """Smoke at fixture scale: the funnel is monotone and nothing crashes."""
    docs = read_parquet_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    curated, funnel = curate_documents(docs, min_quality=0.0, min_tokens=1)
    assert (
        funnel["input"]
        >= funnel["after_filters"]
        >= funnel["after_exact_dedupe"]
        >= funnel["after_near_dedupe"]
        > 0
    )
    assert curated.count() == funnel["after_near_dedupe"]


def test_near_dedupe_staging_path_matches_persist_path(spark, tmp_path):
    """The 100 TB materialization mode: routing the shared shingle stage
    through a parquet staging table must produce the identical pair set,
    and the parquet staging files must actually exist."""
    import os

    from bioeco_portal_etl_spark.text.dedupe import ngram_jaccard_pairs

    docs = normalize_documents(_corpus(spark))
    mem = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    )
    staged_dir = str(tmp_path / "shingles")
    staged = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, staging_path=staged_dir
        ).collect()
    )
    assert staged == mem and staged
    assert any(f.endswith(".parquet") for f in os.listdir(staged_dir))


def test_near_dedupe_stage_handles_enable_unpersist(spark):
    """Callers looping per batch must be able to release the shingle cache:
    the persisted handle is surfaced and unpersist() drops its storage."""
    from bioeco_portal_etl_spark.text.dedupe import ngram_jaccard_pairs

    docs = normalize_documents(_corpus(spark))
    handles = []
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, stage_handles=handles
    )
    pairs.count()
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist(blocking=True)
    assert not handles[0].is_cached


def test_curation_funnel_with_staging_dir(spark, tmp_path):
    curated, funnel = curate_documents(
        _corpus(spark),
        min_quality=0.05,
        jaccard_threshold=0.7,
        staging_dir=str(tmp_path / "stage"),
    )
    assert funnel["after_near_dedupe"] == 2
    assert sorted(r.doc_id for r in curated.collect()) == [1, 7]


def test_curation_with_benchmark_decontamination(spark):
    """A benchmark doc overlapping a surviving corpus doc removes it, with
    its own funnel stage."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    curated, funnel = curate_documents(
        _corpus(spark),
        min_quality=0.05,
        jaccard_threshold=0.7,
        benchmark=bench,
        decontam_min_common=2,
    )
    assert "after_decontamination" in funnel
    assert funnel["after_decontamination"] <= funnel["after_near_dedupe"]


def test_curation_with_history_bloom_and_chunking(spark):
    """Incremental + chunked run: docs already in the history corpus are
    gated before annotation (no false negatives on exact content), and the
    output is reshaped to (doc, window) training units."""
    docs = read_parquet_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") >= 400)
    history = docs.filter(F.col("doc_id") < 450)  # overlaps 400-449
    curated, funnel = curate_documents(
        batch,
        min_quality=0.0,
        min_tokens=1,
        history=history,
        chunk_size=16,
        chunk_stride=12,
    )
    # every doc with id in [400, 450) has its exact content in history
    assert funnel["after_history_dedupe"] <= funnel["input"] - 50
    assert funnel["chunks"] == curated.count()
    cols = set(curated.columns)
    assert {"doc_id", "chunk_id", "start_tok", "n_tok", "chunk"} <= cols
    # chunked ids are a subset of the docs that survived the funnel
    surviving = {r.doc_id for r in curated.select("doc_id").distinct().collect()}
    assert surviving and all(i >= 450 for i in surviving)
