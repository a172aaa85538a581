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


def _write_slice(d, i, rows):
    """One micro-batch file of (user_id, ts_us, event_id) rows."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        f"{d}/part-{i:03d}.parquet",
    )


def _drain(spark, d, outdir, gap_seconds, state_ttl_ms, checkpoint, expect_input_rows):
    """Process the directory's pending files in one query run; state
    persists across calls via the checkpoint (parquet sink — the memory
    sink cannot recover from a checkpoint). A registered processing-time
    timeout keeps the engine scheduling timeout-sweep batches forever
    (shouldRunAnotherBatch is always true), so NEITHER processAllAvailable
    NOR availableNow-termination ever settles with a TTL — the supported
    harness (same trade streaming_dedupe documents) is: poll recentProgress
    until the expected input rows were processed, then stop the run."""
    import time

    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
    )
    q = (
        streaming_sessionize(stream, gap_seconds=gap_seconds, state_ttl_ms=state_ttl_ms)
        .writeStream.format("parquet")
        .option("path", outdir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            done = sum(int(p["numInputRows"]) for p in q.recentProgress)
            if not q.isActive or done >= expect_input_rows:
                break
            time.sleep(0.2)
        else:
            raise AssertionError(f"drain timed out: {q.recentProgress}")
    finally:
        q.stop()


def _harvest(spark, outdir):
    df = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, "
        "duration_sec long, n_events long"
    ).parquet(outdir)
    return sorted(
        (r.user_id, r.session_start.timestamp(), r.session_end.timestamp(), r.n_events)
        for r in df.collect()
    )


def test_ttl_evicts_idle_open_session(spark, tmp_path):
    """Beyond-TTL side of the late-data boundary (round-3 ADVICE: the TTL
    knob must actually evict). user 1 opens a session, goes idle past the
    TTL while another user's batch fires the timeout sweep, then returns:
    the pre-idle open session must be DROPPED (never emitted), and the
    post-idle events must start a fresh session — not extend the old one."""
    import time

    us = 1_000_000
    gap_s = 1000  # huge: only eviction (never the gap) can split here

    def run(tag, ttl_ms, sleep_s):
        d = str(tmp_path / f"{tag}_events")
        os.makedirs(d)
        ckpt = str(tmp_path / f"{tag}_ckpt")
        out = str(tmp_path / f"{tag}_out")
        _write_slice(d, 0, [(1, 0 * us, 100), (1, 10 * us, 101)])  # open [0,10]
        _drain(spark, d, out, gap_s, ttl_ms, ckpt, 2)
        time.sleep(sleep_s)
        # a batch with ONLY user 2 runs the timeout sweep for idle user 1
        _write_slice(d, 1, [(2, 0 * us, 200)])
        _drain(spark, d, out, gap_s, ttl_ms, ckpt, 1)
        # user 1 returns within the (huge) gap; the far-future event in the
        # SAME batch closes whatever session the return started/extended —
        # emitted immediately, so the assertion doesn't depend on state
        # surviving any further TTL sweeps.
        _write_slice(d, 2, [(1, 20 * us, 102), (1, 5000 * us, 103)])
        _drain(spark, d, out, gap_s, ttl_ms, ckpt, 2)
        return [(s, e, n) for (u, s, e, n) in _harvest(spark, out) if u == 1]

    # TTL armed: user 1's open [0,10] is evicted while idle -> the return
    # starts a FRESH session [20,20] n=1 (the evicted one is never emitted).
    assert run("ttl", 100, 1.5) == [(20.0, 20.0, 1)]
    # control (no TTL): identical replay carries [0,10] across the idle gap
    # -> extended to [0,20] and closed with n=3. This pins that the split
    # above is the TTL's doing, not incidental state loss across restarts.
    assert run("nottl", None, 1.5) == [(0.0, 20.0, 3)]


def test_late_event_within_open_session_absorbed(spark, tmp_path):
    """Within-the-boundary side: a cross-batch late event that lands inside
    the still-open session is absorbed (n_events++, bounds unchanged) and
    must NOT rewind the session end — the next on-time event within gap of
    the true end extends the same session instead of splitting it."""
    d = str(tmp_path / "late_events")
    os.makedirs(d)
    ckpt = str(tmp_path / "late_ckpt")
    us = 1_000_000
    gap_s = 100
    _write_slice(d, 0, [(1, 1000 * us, 100), (1, 1050 * us, 101)])  # open [1000,1050]
    # late (t=1010 < open end) then on-time t=1120: 1120-1050=70 <= gap, but
    # 1120-1010=110 > gap — a rewound end would spuriously close at 1010
    _write_slice(d, 1, [(1, 1010 * us, 102)])
    _write_slice(d, 2, [(1, 1120 * us, 103)])
    _write_slice(d, 3, [(1, 9000 * us, 104)])  # closes the merged session
    out = str(tmp_path / "late_out")
    _drain(spark, d, out, gap_s, None, ckpt, 5)
    got = [(s, e, n) for (u, s, e, n) in _harvest(spark, out)]
    assert got == [(1000.0, 1120.0, 4)], got
