"""resample_interpolate (operators/resample.py): interpolation math on
known brackets, exact-hit and single-event edges, partition invariance."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.operators.resample import HOUR_US, resample_interpolate


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def _run(spark, rows):
    rows = [(u, _ts(t), v) for u, t, v in rows]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample_interpolate(df, "user_id", "ts", "value")
    return sorted((r.user_id, r.grid_ts, r.value_e4) for r in out.collect())


def test_linear_interpolation_and_exact_hits(spark):
    rows = [
        # user 1: events at 00:30 (v=10) and 02:30 (v=30) ->
        # grid 01:00 = 15, grid 02:00 = 25
        (1, "2024-01-01 00:30:00", 10.0),
        (1, "2024-01-01 02:30:00", 30.0),
        # user 2: event exactly ON the hour -> its own value
        (2, "2024-01-01 05:00:00", 7.5),
    ]
    h = lambda s: int(s) * HOUR_US  # noqa: E731
    base = 1704067200 // 3600 * HOUR_US  # 2024-01-01 00:00 UTC in µs
    got = _run(spark, rows)
    assert got == [
        (1, base + h(1), 150000),
        (1, base + h(2), 250000),
        (2, base + h(5), 75000),
    ]


def test_no_whole_hour_in_range_yields_nothing(spark):
    rows = [(1, "2024-01-01 00:10:00", 1.0), (1, "2024-01-01 00:50:00", 2.0)]
    assert _run(spark, rows) == []


def test_partition_invariant(spark):
    rows = [
        (u, _ts(f"2024-01-01 {hh:02d}:{mm:02d}:00"), float(u * 10 + hh))
        for u in (1, 2, 3)
        for hh, mm in [(0, 20), (1, 40), (3, 10), (7, 59)]
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a = sorted(map(tuple, resample_interpolate(df, "user_id", "ts", "value").collect()))
    b = sorted(
        map(
            tuple,
            resample_interpolate(
                df.repartition(7, F.col("value")), "user_id", "ts", "value"
            ).collect(),
        )
    )
    assert a == b and len(a) > 0
