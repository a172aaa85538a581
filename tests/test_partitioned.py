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


def test_compact_partitions_merges_small_files(spark, tmp_path):
    import glob

    import pyspark.sql.functions as F

    from bioeco_portal_etl_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        (F.col("id") % 2).alias("part"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    # simulate a micro-batch sink: many tiny files per partition
    df.repartition(16).write.partitionBy("part").parquet(path)
    before = len(glob.glob(f"{path}/part=*/*.parquet"))
    assert before >= 16
    snapshot = sorted((r["part"], r["k"], r["v"]) for r in spark.read.parquet(path).collect())

    compact_partitions(
        spark, path, ["part"], ["k"], max_records_per_file=10_000
    )
    after = len(glob.glob(f"{path}/part=*/*.parquet"))
    assert after < before and after <= 4
    # data identical after compaction
    got = sorted((r["part"], r["k"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == snapshot


def test_compact_partitions_scoped_predicate_leaves_others(spark, tmp_path):
    import glob

    import pyspark.sql.functions as F

    from bioeco_portal_etl_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t2")
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("part"), F.col("id").alias("k")
    )
    df.repartition(8).write.partitionBy("part").parquet(path)
    files_p1_before = set(glob.glob(f"{path}/part=1/*.parquet"))

    compact_partitions(
        spark, path, ["part"], ["k"], 10_000, partition_predicate="part = 0"
    )
    # partition 1 untouched (dynamic overwrite only replaces what was read)
    assert set(glob.glob(f"{path}/part=1/*.parquet")) == files_p1_before
    assert len(glob.glob(f"{path}/part=0/*.parquet")) <= 2
