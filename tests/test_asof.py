"""asof_join / range_join_binned edge semantics beyond the oracle check:
tolerance cutoffs, unmatched lefts, same-instant ties, bucket boundaries,
and partition invariance (the window formulation must not depend on input
layout)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.operators.asof import asof_join, range_join_binned


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:10:00")),
            (2, 10, _ts("2024-01-01 00:00:30")),  # before any right row
            (3, 20, _ts("2024-01-01 01:00:00")),  # exact tie with right ts
            (4, 30, _ts("2024-01-01 02:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:01:00"), 100.0),
            (10, _ts("2024-01-01 00:09:00"), 200.0),
            (20, _ts("2024-01-01 01:00:00"), 300.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_picks_latest_at_or_before(spark, frames):
    left, right = frames
    out = {r.event_id: r for r in asof_join(
        left, right, "user_id", "ts", "ts", ["value"]
    ).collect()}
    assert out[1].asof_value == 200.0      # latest of two earlier rows
    assert out[2].asof_value is None       # nothing at or before
    assert out[3].asof_value == 300.0      # same-instant right row matches
    assert out[4].asof_value is None       # key absent from right
    assert out[1].asof_ts == _ts("2024-01-01 00:09:00")


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {r.event_id: r for r in asof_join(
        left, right, "user_id", "ts", "ts", ["value"], tolerance_s=90.0
    ).collect()}
    assert out[1].asof_value == 200.0      # 60s gap, within 90s
    assert out[3].asof_value == 300.0      # 0s gap
    assert out[4].asof_value is None


def test_asof_tight_tolerance_drops_all_but_exact(spark, frames):
    left, right = frames
    out = {r.event_id: r for r in asof_join(
        left, right, "user_id", "ts", "ts", ["value"], tolerance_s=10.0
    ).collect()}
    assert out[1].asof_value is None       # 60s gap > 10s
    assert out[1].asof_ts is None
    assert out[3].asof_value == 300.0


def test_asof_null_payload_not_backfilled_from_older_row(spark):
    """When the MATCHED right row carries NULLs in some payload columns,
    the output must inherit those NULLs — not fall back per-column to an
    older right row (the struct-carry contract; per-column last(ignorenulls)
    would silently mix columns from different right rows)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:10:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:01:00"), 100.0, "old"),
            (10, _ts("2024-01-01 00:09:00"), None, "new"),  # matched row
        ],
        "user_id long, ts timestamp, value double, tag string",
    )
    (row,) = asof_join(
        left, right, "user_id", "ts", "ts", ["value", "tag"]
    ).collect()
    assert row.asof_ts == _ts("2024-01-01 00:09:00")
    assert row.asof_tag == "new"
    assert row.asof_value is None  # NOT 100.0 from the older row


def test_asof_rejects_column_collision(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "user_id", "ts", "ts", ["ts"])


def test_asof_partition_invariant(spark, frames):
    left, right = frames
    a = asof_join(left, right, "user_id", "ts", "ts", ["value"])
    b = asof_join(
        left.repartition(7), right.repartition(5), "user_id", "ts", "ts", ["value"]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_range_join_boundary_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:10:00"))],
        "err_id long, user_id long, err_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:05:00")),   # exactly radius away (300s)
            (10, _ts("2024-01-01 00:15:00")),   # exactly radius after
            (10, _ts("2024-01-01 00:04:59")),   # 1s outside
            (10, _ts("2024-01-01 00:15:01")),   # 1s outside
            (99, _ts("2024-01-01 00:10:00")),   # other key
        ],
        "user_id long, click_ts timestamp",
    )
    got = range_join_binned(
        left, right, "user_id", "err_ts", "click_ts", 300.0
    ).collect()
    assert sorted(r.click_ts for r in got) == [
        _ts("2024-01-01 00:05:00"),
        _ts("2024-01-01 00:15:00"),
    ]


def test_range_join_validates_radius(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        range_join_binned(left, right, "user_id", "ts", "ts", 0)
