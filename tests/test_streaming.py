"""Streaming ≡ batch equivalence (SURVEY.md §7 step 8).

The same column expressions (streaming/windows.py) must produce identical
results via Structured Streaming (file source -> availableNow -> memory sink)
and via the batch DataFrame path that the DuckDB oracle already validates.
"""

from __future__ import annotations

import pytest

from bioeco_portal_etl_spark.sources.files import read_parquet_table
from bioeco_portal_etl_spark.streaming.windows import (
    read_event_stream,
    run_stream_to_memory,
    session_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """events re-materialized with µs timestamps (streaming readers can't use
    the nanos-as-long legacy path read_parquet_table handles for batch)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    read_parquet_table(spark, SF_SMOKE, "events").write.parquet(path)
    return path


def _sig(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, event_dir):
    batch = tumbling_counts(spark.read.parquet(event_dir))
    q = run_stream_to_memory(
        tumbling_counts(read_event_stream(spark, event_dir)), "tumbling_mem"
    )
    q.awaitTermination(120)
    streamed = spark.table("tumbling_mem")
    assert _sig(streamed) == _sig(batch)


def test_session_stream_equals_batch(spark, event_dir):
    batch = session_counts(spark.read.parquet(event_dir))
    q = run_stream_to_memory(
        session_counts(read_event_stream(spark, event_dir)), "session_mem"
    )
    q.awaitTermination(120)
    streamed = spark.table("session_mem")
    assert _sig(streamed) == _sig(batch)
