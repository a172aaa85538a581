"""Streaming foreachBatch -> keyed upsert: the relational table converges
to the batch aggregate, and replaying the stream is idempotent."""

from __future__ import annotations

import sqlite3

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.sources.files import read_parquet_table
from bioeco_portal_etl_spark.streaming.sink import stream_upsert
from bioeco_portal_etl_spark.streaming.windows import EVENT_SCHEMA
from tests.conftest import SF_SMOKE


def _sqlite_factory(path):
    def connect():
        return sqlite3.connect(path, timeout=60)

    return connect


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_sink") / "events")
    read_parquet_table(spark, SF_SMOKE, "events").write.parquet(path)
    return path


def _totals(df):
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def test_stream_upsert_converges_to_batch(spark, event_dir, tmp_path):
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as c:
        c.execute(
            "CREATE TABLE user_totals "
            "(user_id INTEGER PRIMARY KEY, n_events INTEGER, total_value REAL)"
        )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(event_dir)
    q = stream_upsert(
        _totals(stream),
        _sqlite_factory(db),
        "user_totals",
        ["user_id"],
        ["n_events", "total_value"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",  # file source in one availableNow pass
        dialect="sqlite",
    )
    q.awaitTermination(120)
    expect = {
        (r.user_id, r.n_events, r.total_value)
        for r in _totals(spark.read.parquet(event_dir)).collect()
    }
    with sqlite3.connect(db) as c:
        got = set(c.execute("SELECT user_id, n_events, total_value FROM user_totals"))
    assert got == expect and len(got) > 0

    # replay from a FRESH checkpoint (same data): table state unchanged —
    # the keyed upsert makes re-delivery idempotent
    q2 = stream_upsert(
        _totals(spark.readStream.schema(EVENT_SCHEMA).parquet(event_dir)),
        _sqlite_factory(db),
        "user_totals",
        ["user_id"],
        ["n_events", "total_value"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
        output_mode="complete",
        dialect="sqlite",
    )
    q2.awaitTermination(120)
    with sqlite3.connect(db) as c:
        got2 = set(c.execute("SELECT user_id, n_events, total_value FROM user_totals"))
    assert got2 == expect
