"""Tier equivalence for the partition-batched grouped map
(operators/grouped_map.py): the batched resample/EWMA must reproduce the
per-group applyInPandas reference EXACTLY, including when Arrow batches
split a group (the carry path)."""

from __future__ import annotations

import datetime as dt

import pytest


def _events(spark, n_users=7, per_user=23):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(n_users):
        for i in range(per_user):
            eid += 1
            rows.append(
                (
                    eid,
                    base + dt.timedelta(minutes=17 * i + u),
                    u,
                    float((u * 31 + i * 7) % 100) + 0.25,
                )
            )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


@pytest.fixture()
def tiny_batches(spark):
    """Force multi-batch Arrow transfer so groups split across batches."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "10")
    yield
    spark.conf.set(key, prev)


def test_ewma_batched_equals_per_group_reference(spark, tiny_batches):
    import pyspark.sql.functions as F

    from bioeco_portal_etl_spark.operators.timeseries import (
        _ewma_group,
        ewma,
    )

    df = _events(spark)
    got = {
        (r["user_id"], r["event_id"]): r["ewma_e4"]
        for r in ewma(df, "user_id", "ts", "event_id", "value").collect()
    }
    prepared = df.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t"),
        F.floor(F.col("value") * 10000).cast("long").alias("v_e4"),
    )
    ref_df = prepared.groupBy("user_id").applyInPandas(
        lambda pdf: _ewma_group(pdf, 2),
        schema="user_id long, event_id long, ewma_e4 long",
    )
    ref = {
        (r["user_id"], r["event_id"]): r["ewma_e4"] for r in ref_df.collect()
    }
    assert got == ref and len(got) == 7 * 23


def test_resample_batched_equals_per_group_reference(spark, tiny_batches):
    import pyspark.sql.functions as F

    from bioeco_portal_etl_spark.operators.resample import (
        OUT_SCHEMA,
        _resample_group,
        resample_interpolate,
    )

    df = _events(spark)
    got = {
        (r["user_id"], r["grid_ts"]): r["value_e4"]
        for r in resample_interpolate(df, "user_id", "ts", "value").collect()
    }
    prepared = df.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t"),
        F.col("value").cast("double").alias("value"),
    )
    ref_df = prepared.groupBy("user_id").applyInPandas(
        lambda pdf: _resample_group(pdf), schema=OUT_SCHEMA
    )
    ref = {
        (r["user_id"], r["grid_ts"]): r["value_e4"] for r in ref_df.collect()
    }
    assert got == ref and len(got) > 0


def test_map_complete_groups_carry_never_splits_a_group(spark, tiny_batches):
    import pandas as pd

    from bioeco_portal_etl_spark.operators.grouped_map import (
        map_complete_groups,
    )

    df = _events(spark).select("user_id", "event_id")

    def assert_whole_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        # each call must contain every row of each key it contains
        counts = pdf.groupby("user_id").size()
        return pd.DataFrame(
            {"user_id": counts.index, "n": counts.to_numpy()}
        )

    out = map_complete_groups(
        df, "user_id", ["event_id"], assert_whole_groups, "user_id long, n long"
    ).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n"])
    # every user appears in exactly ONE call, with all 23 rows
    assert all(v == [23] for v in per_user.values())
    assert len(per_user) == 7
