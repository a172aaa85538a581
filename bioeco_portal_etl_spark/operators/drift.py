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


def psi_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    cur_col: str,
    n_bins: int = 20,
    bin_width: float = 25.0,
) -> DataFrame:
    """Population Stability Index per ``key_col`` between the reference
    slice (``cur_col`` false) and the current slice (true): the standard
    cross-dataset distribution-drift score (PSI < 0.1 stable, > 0.25
    action), complementing :func:`cusum_drift`'s within-stream level
    shifts. Output: (key, n_ref, n_cur, psi_e4).

    Semantics pinned for cross-engine exactness (PORTABILITY.md):
    fixed-width bins ``least(floor(v / bin_width), n_bins - 1)``; Laplace
    smoothing ``p = (n + 1) / (N + n_bins)`` keeps ln finite; each bin's
    ``(p_cur - p_ref) * ln(p_cur / p_ref)`` is floored to e4 BEFORE the
    per-key sum, so the reduction is associative integer addition — the
    one libm call sits inside the floor. Bins observed in neither slice
    are omitted (both engines build the bin table from the data, so the
    omission is symmetric).

    Plan: one map-side-combined groupBy (key, bin) collapses the corpus
    to key*bins rows; the per-key totals are window sums over that tiny
    table (second exchange moves bins-sized data, not rows); final
    groupBy(key) reuses the same partitioning. At 100 TB only the first
    exchange sees data-scale volume, and it ships pre-aggregated counts.
    """
    b = F.least(
        F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(n_bins - 1)
    ).cast("long")
    cur = F.col(cur_col).cast("long")
    binned = df.select(F.col(key_col), b.alias("bin"), cur.alias("__c"))
    counts = binned.groupBy(key_col, "bin").agg(
        F.sum(F.lit(1) - F.col("__c")).alias("n_ref_b"),
        F.sum("__c").alias("n_cur_b"),
    )
    w = Window.partitionBy(key_col)
    p_ref = (F.col("n_ref_b") + 1).cast("double") / (
        F.sum("n_ref_b").over(w) + F.lit(n_bins)
    ).cast("double")
    p_cur = (F.col("n_cur_b") + 1).cast("double") / (
        F.sum("n_cur_b").over(w) + F.lit(n_bins)
    ).cast("double")
    terms = counts.select(
        key_col,
        "n_ref_b",
        "n_cur_b",
        F.floor((p_cur - p_ref) * F.log(p_cur / p_ref) * 10000)
        .cast("long")
        .alias("term_e4"),
    )
    return terms.groupBy(key_col).agg(
        F.sum("n_ref_b").alias("n_ref"),
        F.sum("n_cur_b").alias("n_cur"),
        F.sum("term_e4").alias("psi_e4"),
    )
