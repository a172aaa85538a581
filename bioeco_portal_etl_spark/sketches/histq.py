"""Mergeable fixed-bin histogram quantiles with an exactness certificate.

The reaggregation story (same as sketches/hll.py's register merge, sk7):
fine-grain histograms — per day, per source, per partition — MERGE by
plain bin-count addition into any coarser grain, so a 100 TB pipeline
keeps one small histogram per ingest unit and answers global (or any
rollup) quantiles without ever re-scanning raw data. Resolution is fixed
by the bin width: the estimate returned is the quantile's BIN LOWER
EDGE, wrong by at most one bin width.

The certificate (the certified-approximation pattern, as td12/tx23): the
catalog pairing computes the EXACT nearest-rank quantile next to the
merged-histogram estimate and emits ``contained`` flags — the exact
value must land inside the estimated bin. A 0 in that column is a broken
invariant, not a tuning knob, and the oracle computes the same flag.

All arithmetic integer: values quantized to cents before binning
(floor(value*100), the x16/x17 convention), cumulative-count rank picks
with cross-multiplied comparisons (mult*cum >= mult_n*n — no division),
exact quantile by frequency-table rank selection (never a global
row_number sort; the winsorize lesson).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def binned_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bins: int = 16,
    lo_cents: int = 0,
    step_cents: int = 3200,
) -> DataFrame:
    """(group..., bin, cnt): fixed-bin integer-cents histogram per group.
    One partial-combinable aggregate; output is <= bins rows per group
    regardless of input size."""
    v = F.floor(F.col(value_col) * 100).cast("long")
    bin_ = F.least(
        F.greatest(
            F.floor((v - F.lit(lo_cents)) / F.lit(step_cents)).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(bins - 1).cast("long"),
    )
    return df.select(*group_cols, bin_.alias("bin")).groupBy(
        *group_cols, "bin"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def merge_histograms(hist: DataFrame, to_cols: list[str]) -> DataFrame:
    """Reaggregate histograms to a coarser grain by bin-count addition —
    the lossless merge that makes the sketch grain-agnostic. ``to_cols``
    may be empty (global)."""
    return hist.groupBy(*to_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    pcts: list[tuple[str, int, int]],
    lo_cents: int = 0,
    step_cents: int = 3200,
) -> DataFrame:
    """Quantile bins from a (group..., bin, cnt) histogram: for each
    (name, mult_cum, mult_n) in ``pcts`` (p50 = (2, 1), p90 = (10, 9)),
    the smallest bin whose cumulative count satisfies
    ``mult_cum * cum >= mult_n * n``. Output one row per group with
    ``n`` plus ``{name}_bin`` / ``{name}_est_cents`` columns.

    The cumulative window partitions by group and orders by bin —
    <= bins rows per partition, never a data-sized sort."""
    w = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    cum = hist.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(w).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for name, mc, mn in pcts:
        pick = F.min(
            F.when(mc * F.col("cum") - mn * F.col("n") >= 0, F.col("bin"))
        )
        aggs.append(pick.alias(f"{name}_bin"))
    out = cum.groupBy(*group_cols).agg(*aggs)
    for name, _, _ in pcts:
        out = out.withColumn(
            f"{name}_est_cents",
            F.lit(lo_cents) + F.col(f"{name}_bin") * F.lit(step_cents),
        )
    return out


def exact_quantiles_cents(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    pcts: list[tuple[str, int, int]],
) -> DataFrame:
    """Exact nearest-rank quantiles in cents by frequency-table rank
    selection: rank r(name) = smallest r with mult_cum * r >= mult_n * n
    (the ceil-rank matching hist_quantiles' pick), value = smallest
    distinct v whose cumulative frequency reaches r. The window runs over
    the DISTINCT-value table (range-bounded), never the raw rows."""
    v = F.floor(F.col(value_col) * 100).cast("long")
    freq = df.select(*group_cols, v.alias("__v")).groupBy(
        *group_cols, "__v"
    ).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    cum = freq.select(
        *group_cols,
        "__v",
        F.sum("__c").over(w.orderBy("__v")).alias("cum"),
        F.sum("__c").over(w).alias("n"),
    )
    aggs = []
    for name, mc, mn in pcts:
        aggs.append(
            F.min(
                F.when(mc * F.col("cum") - mn * F.col("n") >= 0, F.col("__v"))
            ).alias(f"{name}_exact_cents")
        )
    return cum.groupBy(*group_cols).agg(*aggs)
