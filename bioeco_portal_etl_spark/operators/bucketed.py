"""Bucketed (pre-shuffled) table layout — the co-located join strategy.

The reference joins tiny frames in memory (SURVEY.md §2.5: every build side
<= 1,440 rows), so it never needs this. At 100 TB the expensive joins are
fact-to-fact (lineitem⋈orders on orderkey; documents⋈signatures on doc_id)
and each one costs a full shuffle of both sides. Bucketing pays that
shuffle ONCE at write time: ``bucketBy(n, key)`` hashes rows into ``n``
stable buckets per table, and every later equi-join or groupBy on the
bucket key reads co-located partitions directly — Catalyst drops the
Exchange on both sides (pinned by tests/test_bucketed.py). This is the
Spark-native equivalent of the hash-distributed table layout every MPP
warehouse uses for its fact tables.

Guidance for the 100 TB deployment:
- bucket both sides of a recurring fact⋈fact join by the SAME key with the
  SAME bucket count (Spark requires equal counts to elide the shuffle);
- choose n ≈ cluster cores × small-integer so one bucket ≈ one task;
- ``sortBy`` the bucket key so single-file buckets also skip the SMJ sort;
- writes go through ``saveAsTable`` (bucket metadata lives in the
  catalog; a bare ``parquet(path)`` write cannot carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed table (external when ``path`` given).

    The one-time shuffle implied by the bucketed layout is the amortized
    cost; downstream joins/aggs on ``bucket_cols`` are then narrow."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (``spark.table``;
    a raw ``read.parquet`` of the same files would lose the layout and
    reintroduce the shuffle)."""
    return spark.table(table)
