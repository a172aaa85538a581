"""CUSUM drift detection over per-key ordered measurement streams: the
cumulative sum of deviations from the global mean crosses a threshold as
soon as the level shifts — the classic Page (1954) change-detection
statistic, here as the batch face for data-drift monitoring of a feature
column across a 100 TB corpus refresh.

Plan: global mean is ONE tiny aggregate broadcast back as a scalar; the
cumulative sum is a single window over the key-hash exchange every other
per-key op reuses. All arithmetic is fixed-point integer (values
quantized in the scan stage; the mean itself stays integer via div), so
trajectories are engine-exact — no float accumulation drift across
partitions or engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cusum_drift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    threshold_e: int,
    scale: int = 100,
) -> DataFrame:
    """Per-key CUSUM summary: (key, n_events, max_abs_cusum_e,
    first_cross_id) where the cusum walks ``Σ (v_e - global_mean_e)`` in
    ``(ts, id)`` order and ``first_cross_id`` is the earliest event whose
    |cusum| exceeds ``threshold_e`` (null = never crossed).

    The deviation baseline is the GLOBAL mean (integer div of e-scaled
    sums — truncation is identical cross-engine on these non-negative
    sums), so keys drifting away from corpus-level behavior flag even
    when internally consistent."""
    v = F.floor(F.col(value_col) * scale).cast("long")
    vals = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        v.alias("__v"),
    )
    mean = vals.agg(
        F.expr("sum(__v) div count(*)").alias("__mean_e")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("__ts", "__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = vals.join(F.broadcast(mean)).select(
        "key",
        "__id",
        F.sum(F.col("__v") - F.col("__mean_e")).over(w).alias("__s"),
    )
    return walked.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.abs(F.col("__s"))).alias("max_abs_cusum_e"),
        F.min(
            F.when(F.abs(F.col("__s")) > threshold_e, F.col("__id"))
        ).alias("first_cross_id"),
    )
