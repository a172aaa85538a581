"""Interval union (merge-overlapping) per key — the interval-algebra
companion to sessionize/islands: given [start, end] spans, coalesce every
overlapping-or-touching chain into one span.

Classic single-window plan (no self-join, no recursion): order spans by
(start, tiebreak) within the key; a span STARTS a new merged group iff its
start exceeds the running max of all PREVIOUS ends; the running sum of
those start-flags is the group id; one groupBy closes each group. Two
window functions over ONE window spec = one hash exchange + one
in-partition sort — same scale family as sessionize, and the operator a
100 TB availability/coverage report needs (sensor uptime, lease overlap,
validity-range compaction).

Arithmetic is pure integer epoch-microseconds (timestamps cast through
``timestamp_ltz`` exactly like operators/sessions.py — the NTZ-vs-LTZ
epoch trap is pinned there), so the merged boundaries hash-match any
engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """One row per maximal overlapping chain:
    (key..., merge_start, merge_end, n_intervals). ``start_col``/``end_col``
    are timestamps; touching intervals (next.start == prev.end) merge."""
    base = df.select(
        *key_cols,
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.col(tiebreak_col).alias("__tb"),
    )
    w = Window.partitionBy(*key_cols).orderBy("__s", "__tb")
    s_us = F.unix_micros(F.col("__s").cast("timestamp_ltz"))
    e_us = F.unix_micros(F.col("__e").cast("timestamp_ltz"))
    prev_max_end = F.max(e_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    starts_chain = (
        prev_max_end.isNull() | (s_us > prev_max_end)
    ).cast("long")
    chain = F.sum(starts_chain).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("__chain", chain)
        .groupBy(*key_cols, "__chain")
        .agg(
            F.min("__s").alias("merge_start"),
            F.max("__e").alias("merge_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__chain")
    )
