"""Streaming -> keyed-upsert sink via foreachBatch.

The reference's DB sync is a one-shot batch of per-row UPDATEs
(notebooks/index.Rmd:706-763); the streaming generalization keeps a
relational table continuously in sync with an event stream. Structured
Streaming's file/kafka sinks are append-only, so keyed mutation goes
through ``foreachBatch``: each micro-batch is a plain DataFrame handed to
the SAME idempotent upsert writer the batch path uses
(sinks/jdbc_upsert.upsert_partitioned, ON CONFLICT DO UPDATE).

Exactly-once story: Spark guarantees at-least-once foreachBatch delivery
(a batch can be re-run after failure); the upsert is keyed and
last-write-wins, so replaying a batch converges to the same table state —
idempotence is the sink-side half of exactly-once. State the stream
carries (aggregations upstream of the sink) is checkpointed by Spark.

Scale notes: each micro-batch writes with ``foreachPartition``
parallelism (one connection + one transaction per partition); key skew in
the batch maps to partition skew — repartition by key upstream if one
entity dominates a batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from bioeco_portal_etl_spark.sinks.jdbc_upsert import upsert_partitioned


def stream_upsert(
    stream_df: DataFrame,
    connect: Callable[[], object],
    table: str,
    key_cols: list[str],
    update_cols: list[str],
    checkpoint_dir: str,
    query_name: str = "stream_upsert",
    output_mode: str = "update",
    dialect: str = "postgres",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously upsert a (keyed) streaming frame into a relational
    table. ``output_mode='update'`` emits only changed aggregate rows per
    micro-batch — the natural pairing for an upsert sink."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitioned(
            batch_df, connect, table, key_cols, update_cols, dialect=dialect
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
