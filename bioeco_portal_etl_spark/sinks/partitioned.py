"""Hive-style partitioned parquet layout — the scan-pruning counterpart
to operators/bucketed.py's join-pruning.

The reference writes one directory per program identifier by hand
(notebooks/index.Rmd:404-412 builds `output/{identifier}/` paths in a
loop); `partitionBy` is the engine-native generalization: the writer
fans rows into `col=value/` directories, and every later read with a
predicate on the partition column prunes to matching directories BEFORE
any file is opened (`PartitionFilters` in the scan node — pinned by
tests/test_partitioned.py). At 100 TB this is the difference between
scanning a day and scanning a decade.

Guidance:
- partition on low-cardinality, always-filtered columns (event date,
  region); high-cardinality partitioning (user_id) creates millions of
  tiny files and kills the file index;
- pair with in-file sorting or bucketing for secondary keys;
- use ``overwrite_partitions`` (dynamic mode) for incremental reloads —
  it replaces ONLY the partitions present in the incoming frame, the
  idempotent daily-backfill primitive; a plain overwrite would drop the
  whole table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write `df` as parquet partitioned by ``partition_cols``."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition cols not in frame: {missing}")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: replace only the partitions that occur
    in ``df``, leaving sibling partitions untouched (safe incremental
    reload; rerunning the same batch is idempotent)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_partitioned(df, path, partition_cols, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back (partition columns are recovered
    from directory names by the file index)."""
    return spark.read.parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    max_records_per_file: int,
    partition_predicate: str | None = None,
) -> None:
    """Small-file compaction — the maintenance job every streaming /
    incremental sink eventually needs: micro-batch and per-task writers
    leave thousands of KB-sized files per partition, and at 100 TB the
    file-listing + open overhead starts to dominate scans long before
    the bytes do.

    Rewrites the selected partitions in place: read -> sort within the
    partition on ``sort_cols`` (restores clustering for min/max row-group
    skipping, which interleaved appends destroy) -> write with
    ``maxRecordsPerFile`` bounding file size -> DYNAMIC partition
    overwrite, so only the partitions actually read are replaced and a
    concurrent reader never sees a half-table. ``partition_predicate``
    (e.g. ``"event_date = '2024-01-01'"``) scopes the job to the
    partitions worth compacting — partition pruning makes the read side
    touch only those directories.

    Idempotent: re-running compaction over the same partitions rewrites
    byte-equivalent content (deterministic sort, deterministic file
    splits)."""
    df = spark.read.parquet(path)
    if partition_predicate is not None:
        df = df.filter(partition_predicate)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(*[F.col(c) for c in partition_cols])
            .sortWithinPartitions(*partition_cols, *sort_cols)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
