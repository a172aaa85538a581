"""Continuous corpus construction: streaming ingest with incremental
content dedupe.

The 100 TB ingest loop: documents arrive continuously; only content never
seen before may enter the corpus. The batch formulation (anti-join each
batch against all history) re-shuffles the ever-growing history every
batch. This operator keeps the history as a Bloom filter WORD TABLE
(text/incremental.py: (word, bits) rows, <= m/64 of them, ~1.5 MB at
m=2^23) and exploits that Bloom bitsets are a monoid under bitwise OR:

    bloom(A ∪ B) = bloom(A) | bloom(B)

so per micro-batch the work is O(batch + m/64), independent of history:

    1. read the persisted word table (tiny parquet);
    2. gate the batch against it map-side (broadcast membership join) —
       no false negatives: exact-content repeats NEVER re-enter;
    3. append the survivors to the corpus parquet;
    4. OR the survivors' word table into the persisted one
       (union -> groupBy(word).agg(bit_or)) and atomically swap.

Delivery: foreachBatch is at-least-once (a batch may replay after a
failure), and the loop performs TWO writes (corpus append, bloom swap)
without a cross-store transaction, so the honest contract is
content-level at-least-once: after a clean run of a batch, replaying it
re-gates against a bloom that already holds its bits and appends nothing
(the OR is idempotent); but a crash BETWEEN the two writes can re-append
the same rows on replay (append landed, bloom didn't). Never the
reverse — bloom-swap is ordered after corpus-append, so a gate-passing
doc is never lost, only possibly duplicated. Deployments needing exact
corpus uniqueness run the exact-dedupe pass (td1 shape) over the corpus
downstream, or swap the two stores for a transactional table format; the
gate's no-false-negative property (seen content never re-enters in
crash-free operation) holds regardless.

In-corpus duplicates WITHIN one batch are resolved first (exact_dedupe
keep-min-id), so the operator composes the batch and incremental halves
of the dedupe stack.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from bioeco_portal_etl_spark.text.dedupe import exact_dedupe
from bioeco_portal_etl_spark.text.incremental import (
    bloom_build,
    bloom_new_docs,
)

BLOOM_SCHEMA = "word long, bits long"


def _read_bloom(spark: SparkSession, bloom_dir: str) -> DataFrame | None:
    current = os.path.join(bloom_dir, "current")
    if not os.path.exists(current):
        return None
    return spark.read.schema(BLOOM_SCHEMA).parquet(current)


def _swap_bloom(spark: SparkSession, merged: DataFrame, bloom_dir: str) -> None:
    """Write-new-then-rename so readers never see a partial word table."""
    staged = os.path.join(bloom_dir, "staged")
    current = os.path.join(bloom_dir, "current")
    merged.coalesce(1).write.mode("overwrite").parquet(staged)
    if os.path.exists(current):
        shutil.rmtree(current)
    os.replace(staged, current)


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    bloom_dir: str,
    id_col: str,
    text_col: str,
    m_bits: int,
    k: int,
) -> int:
    """One micro-batch of the dedup ingest loop (shared by the streaming
    foreachBatch and any batch backfill). Returns rows appended."""
    # within-batch exact dedupe: keep the min-id owner of each content hash
    owners = exact_dedupe(batch, id_col, text_col).filter(~F.col("is_duplicate"))
    batch = batch.join(owners.select(id_col), id_col, "left_semi")

    bloom = _read_bloom(spark, bloom_dir)
    if bloom is not None:
        fresh = bloom_new_docs(batch, bloom, id_col, text_col, m_bits, k)
    else:
        fresh = batch
    # materialize ONCE: corpus append and bloom update read the same rows
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(corpus_path)
            delta = bloom_build(fresh, text_col, m_bits, k)
            merged = (
                delta
                if bloom is None
                else bloom.unionByName(delta)
                .groupBy("word")
                .agg(F.bit_or("bits").alias("bits"))
            )
            _swap_bloom(spark, merged, bloom_dir)
        return n
    finally:
        fresh.unpersist()


def stream_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    bloom_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 23,
    k: int = 7,
    query_name: str = "dedup_ingest",
    available_now: bool = False,
) -> StreamingQuery:
    """Continuous dedup ingest: every micro-batch appends only
    never-seen-before content to the corpus parquet and ORs its bits into
    the persisted bloom word table. O(batch + m/64) per batch.
    ``available_now=True`` drains the currently-available input then stops
    (catch-up/backfill runs and tests); the default runs continuously."""

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch.sparkSession,
            batch,
            corpus_path,
            bloom_dir,
            id_col,
            text_col,
            m_bits,
            k,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
