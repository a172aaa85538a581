"""applyInPandasWithState operator tests: streamed results must match the
batch-computed answer once all micro-batches drain (availableNow over a
multi-file source forces multiple batches through the state store)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.sources.files import read_parquet_table
from bioeco_portal_etl_spark.streaming.stateful import running_counts, streaming_dedupe
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def doc_stream_dir(spark, tmp_path_factory):
    """Documents with planted duplicates, split across files so availableNow
    produces several micro-batches (maxFilesPerTrigger=1)."""
    path = str(tmp_path_factory.mktemp("docstream") / "docs")
    docs = read_parquet_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    dupes = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    docs.union(dupes).repartition(2).write.parquet(path)
    return path


def test_streaming_dedupe_matches_batch(spark, doc_stream_dir):
    batch = spark.read.parquet(doc_stream_dir)
    hashed_cols = lambda df: df.select(  # noqa: E731
        F.pmod(F.abs(F.hash(F.md5("text"))), F.lit(8)).cast("int").alias("bucket"),
        "doc_id",
        F.md5("text").alias("content_hash"),
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    q = (
        streaming_dedupe(hashed_cols(stream))
        .writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("dedup_mem")
    # exactly one row per distinct hash, regardless of batch arrival order
    n_distinct = batch.select(F.md5("text")).distinct().count()
    assert got.count() == n_distinct
    assert got.select("content_hash").distinct().count() == n_distinct


def test_running_counts_final_state_matches_batch(spark, doc_stream_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evstream") / "events")
    events = (
        read_parquet_table(spark, SF_SMOKE, "events")
        .select("user_id", "value")
        .limit(2000)
    )
    events.repartition(2).write.parquet(path)
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        running_counts(stream)
        .writeStream.format("memory")
        .queryName("counts_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per key == the batch totals
    got = spark.table("counts_mem")
    w_latest = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value")
    )
    batch = spark.read.parquet(path).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
    )
    joined = w_latest.alias("s").join(batch.alias("b"), "user_id")
    bad = joined.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.sum_value") - F.col("b.sum_value")) > 1e-6)
    )
    assert bad.count() == 0
    assert w_latest.count() == batch.count()


def test_streaming_dedupe_ttl_evicts_state(spark, tmp_path):
    """With a short TTL, state must be REMOVED on timeout: after expiry the
    same content hash is re-emitted (fresh state), proving eviction ran
    instead of the resurrect-forever bug. Uses a processingTime trigger so
    timeout processing happens between files."""
    import time as _time

    d = str(tmp_path / "ttlstream")
    schema = "bucket int, doc_id long, content_hash string"
    spark.createDataFrame([(0, 1, "h1")], schema).coalesce(1).write.parquet(d)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        streaming_dedupe(stream, state_ttl_ms=3000)
        .writeStream.format("memory")
        .queryName("ttl_mem")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline and spark.table("ttl_mem").count() < 1:
            _time.sleep(0.5)
        assert spark.table("ttl_mem").count() == 1  # first h1 emitted
        _time.sleep(6)  # > TTL: bucket 0's state times out
        # a keep-alive batch lets the engine process the expired timer,
        # then the same hash arrives again and must be re-emitted
        spark.createDataFrame([(1, 99, "other")], schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _time.sleep(3)
        spark.createDataFrame([(0, 2, "h1")], schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        deadline = _time.time() + 60
        while _time.time() < deadline:
            rows = spark.table("ttl_mem").filter("content_hash = 'h1'").count()
            if rows >= 2:
                break
            _time.sleep(1)
        assert rows == 2, "state was not evicted after TTL"
    finally:
        q.stop()
