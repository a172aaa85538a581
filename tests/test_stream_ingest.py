"""Continuous corpus construction (streaming/ingest.py): the bloom-gated
ingest loop admits each distinct content exactly once across micro-batches,
and the persisted word table makes later runs incremental."""

from __future__ import annotations

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.streaming.ingest import (
    ingest_batch,
    stream_dedup_ingest,
)

DOC_SCHEMA = "doc_id long, text string"


def _docs(spark, ids, prefix="content"):
    return spark.createDataFrame(
        [(i, f"{prefix} number {i % 100} for testing") for i in ids], DOC_SCHEMA
    )


def test_ingest_batch_admits_each_content_once(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    bloom_dir = str(tmp_path / "bloom")
    m, k = 1 << 20, 7

    # batch 1: ids 0-99, all distinct content
    n1 = ingest_batch(
        spark, _docs(spark, range(100)), corpus, bloom_dir, "doc_id", "text", m, k
    )
    assert n1 == 100
    # batch 2: ids 100-199 — content of (i % 100) repeats batch 1 exactly
    n2 = ingest_batch(
        spark, _docs(spark, range(100, 200)), corpus, bloom_dir, "doc_id", "text", m, k
    )
    assert n2 == 0
    # batch 3: 50 genuinely new + 50 repeats; within-batch dup (two ids,
    # same content) resolved to the min id before the gate
    fresh = _docs(spark, range(200, 250), prefix="NEW")
    dup_of_fresh = fresh.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    batch3 = fresh.unionByName(dup_of_fresh).unionByName(_docs(spark, range(50)))
    n3 = ingest_batch(spark, batch3, corpus, bloom_dir, "doc_id", "text", m, k)
    assert n3 == 50
    out = spark.read.parquet(corpus)
    assert out.count() == 150
    # exactly-once per content: every content hash appears once
    assert out.select(F.md5("text")).distinct().count() == 150
    # the within-batch winner was the min id (200-249, not 1200-1249)
    kept_ids = {r.doc_id for r in out.collect()}
    assert set(range(200, 250)) <= kept_ids and not any(i >= 1000 for i in kept_ids)


def test_stream_dedup_ingest_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    bloom_dir = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")
    m, k = 1 << 20, 7

    _docs(spark, range(80)).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = stream_dedup_ingest(
        stream, corpus, bloom_dir, ckpt, m_bits=m, k=k, available_now=True
    )
    q.awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 80

    # second wave: 40 content-repeats (ids 100-139 -> content 0-39) and
    # 60 new; a RESTARTED query (same checkpoint) picks up only new files
    _docs(spark, range(100, 140)).write.mode("append").parquet(src)
    _docs(spark, range(140, 200), prefix="WAVE2").write.mode("append").parquet(src)
    q2 = stream_dedup_ingest(
        spark.readStream.schema(DOC_SCHEMA).parquet(src),
        corpus,
        bloom_dir,
        ckpt,
        m_bits=m,
        k=k,
        available_now=True,
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(corpus)
    assert out.count() == 140  # 80 + 60 new contents; 40 repeats gated
    assert out.select(F.md5("text")).distinct().count() == 140
