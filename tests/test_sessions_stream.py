"""streaming_sessionize (streaming/sessions_stream.py): the streamed
closed-session set must equal the batch sessionization minus each user's
final (still-open) session — across MULTIPLE micro-batches, with sessions
spanning batch boundaries (the state-carry path), and out-of-order events
within a batch (the in-batch sort path)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from bioeco_portal_etl_spark.operators.sessions import session_stats
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from bioeco_portal_etl_spark.streaming.sessions_stream import streaming_sessionize
from tests.conftest import SF_SMOKE

GAP_S = 1800


@pytest.fixture(scope="module")
def sliced_events_dir(spark, tmp_path_factory):
    """The real events table, time-sliced into 3 files written in time
    order (file names AND mtimes ascending) so maxFilesPerTrigger=1
    replays them as ordered micro-batches; rows WITHIN a slice are written
    ts-descending to force the in-batch sort to do real work."""
    d = str(tmp_path_factory.mktemp("w5stream") / "events")
    os.makedirs(d)
    ev = (
        read_parquet_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    # µs, not pandas' default ns: ns parquet reads back as long under the
    # engine session's nanosAsLong conf and breaks the declared schema
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    n = len(ev)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        part = ev.iloc[lo:hi].sort_values(["ts", "event_id"], ascending=False)
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       f"{d}/part-{i:03d}.parquet")
    return d


def test_streamed_sessions_equal_batch_minus_open(spark, sliced_events_dir):
    batch = spark.read.parquet(sliced_events_dir)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(sliced_events_dir)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
    )
    q = (
        streaming_sessionize(stream, gap_seconds=GAP_S)
        .writeStream.format("memory")
        .queryName("w5_test_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 2, "expected multiple micro-batches"
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.duration_sec, r.n_events)
        for r in spark.table("w5_test_mem").collect()
    )

    stats = session_stats(
        batch.withColumn("ts", F.col("ts").cast("timestamp")),
        "user_id", "ts", "event_id", gap_seconds=GAP_S,
    )
    w = Window.partitionBy("user_id")
    closed = stats.withColumn("mx", F.max("session_seq").over(w)).filter(
        F.col("session_seq") < F.col("mx")
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.duration_sec, r.n_events)
        for r in closed.collect()
    )
    assert got == want
    assert len(got) > 0
