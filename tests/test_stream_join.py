"""Stream-stream interval join: streamed ≡ batch ≡ binned-range-join.

The triangle pins both halves of the temporal-join story: the streaming
execution (two watermarked file streams, append mode) produces exactly
the batch theta-join's rows, and the batch theta-join produces exactly
what operators/asof.range_join_binned computes for the symmetric case —
so the scale-path (binned) and the streaming-path (stateful) agree."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.operators.asof import range_join_binned
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from bioeco_portal_etl_spark.streaming.joins import interval_join
from bioeco_portal_etl_spark.streaming.windows import EVENT_SCHEMA
from tests.conftest import SF_SMOKE

RADIUS = 300.0


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_join") / "events")
    read_parquet_table(spark, SF_SMOKE, "events").write.parquet(path)
    return path


def _errors(df):
    return df.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
    )


def _clicks(df):
    return df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )


def _sig(df):
    return sorted(
        (r.err_id, r.click_id) for r in df.select("err_id", "click_id").collect()
    )


def test_streamed_equals_batch(spark, event_dir):
    batch = interval_join(
        _errors(spark.read.parquet(event_dir)),
        _clicks(spark.read.parquet(event_dir)),
        "user_id", "err_ts", "click_ts", -RADIUS, RADIUS,
    )
    se = _errors(
        spark.readStream.schema(EVENT_SCHEMA).parquet(event_dir)
    ).withWatermark("err_ts", "2 hours")
    sc = _clicks(
        spark.readStream.schema(EVENT_SCHEMA).parquet(event_dir)
    ).withWatermark("click_ts", "2 hours")
    q = (
        interval_join(se, sc, "user_id", "err_ts", "click_ts", -RADIUS, RADIUS)
        .writeStream.format("memory")
        .queryName("ssj_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _sig(spark.table("ssj_mem")) == _sig(batch)
    assert len(_sig(batch)) > 0


def test_batch_equals_binned(spark, event_dir):
    e = spark.read.parquet(event_dir)
    theta = interval_join(
        _errors(e), _clicks(e), "user_id", "err_ts", "click_ts", -RADIUS, RADIUS
    )
    binned = range_join_binned(
        _errors(e), _clicks(e), "user_id", "err_ts", "click_ts", RADIUS
    )
    assert _sig(theta) == _sig(binned)


def test_interval_join_validates(spark, event_dir):
    e = spark.read.parquet(event_dir)
    with pytest.raises(ValueError):
        interval_join(
            _errors(e), _clicks(e), "user_id", "err_ts", "click_ts", 10, -10
        )
    with pytest.raises(ValueError):
        interval_join(
            _errors(e),
            _errors(e).withColumnRenamed("err_ts", "other_ts"),
            "user_id", "err_ts", "other_ts", -10, 10,
        )
