"""Partitioned-layout contracts: directory pruning reaches the scan, and
dynamic overwrite replaces only the incoming partitions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.sinks.partitioned import (
    overwrite_partitions,
    read_partitioned,
    write_partitioned,
)
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_part") / "events")
    ev = read_parquet_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, path, ["event_date"])
    return path


def test_partition_pruning_reaches_scan(spark, part_dir):
    df = read_partitioned(spark, part_dir).filter(
        F.col("event_date") == "2024-01-02"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln][0]
    assert "PartitionFilters" in scan and "event_date" in scan
    # the predicate is a partition filter, NOT a data filter — no row-level
    # evaluation, directories are skipped before any file opens
    assert "DataFilters: []" in scan


def test_partitioned_roundtrip_values(spark, part_dir):
    ev = read_parquet_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    day = "2024-01-02"
    expect = sorted(
        r.event_id for r in ev.filter(F.col("event_date") == day).collect()
    )
    got = sorted(
        r.event_id
        for r in read_partitioned(spark, part_dir)
        .filter(F.col("event_date") == day)
        .collect()
    )
    assert got == expect and len(got) > 0


def test_dynamic_overwrite_touches_only_incoming_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, day string, v long"
    )
    write_partitioned(base, path, ["day"])
    patch = spark.createDataFrame([(3, "b", 99)], "id long, day string, v long")
    overwrite_partitions(patch, path, ["day"])
    got = {(r.id, r.day, r.v) for r in read_partitioned(spark, path).collect()}
    # day=a untouched; day=b fully replaced by the incoming rows
    assert got == {(1, "a", 10), (3, "b", 99)}
    # rerunning the same batch is idempotent
    overwrite_partitions(patch, path, ["day"])
    got2 = {(r.id, r.day, r.v) for r in read_partitioned(spark, path).collect()}
    assert got2 == got


def test_write_partitioned_validates(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        write_partitioned(df, "/tmp/x", [])
    with pytest.raises(ValueError):
        write_partitioned(df, "/tmp/x", ["nope"])
