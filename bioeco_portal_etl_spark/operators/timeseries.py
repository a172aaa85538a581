"""Rolling-window anomaly scoring over event streams (batch face).

``rolling_zscore`` flags events whose value deviates from the trailing
window's mean by more than ``threshold`` standard deviations — the
standard streaming-telemetry outlier gate — as ONE window spec per key
(a single hash exchange + in-partition sort, pure codegen).

Engine-exactness (the reason this isn't just ``stddev_samp`` over a
frame): floating-point SUMS over a sliding frame accumulate in
engine-specific order (Spark re-adds per frame; DuckDB uses segment
trees), so the last ulp differs and gates flip. Here values are quantized
to e4 fixed-point LONGS first; the frame sums (sum, sum of squares) are
then exact integers — order-independent — and mean/variance/z follow with
a short IEEE +-*/sqrt chain on those exact integers, which both engines
round identically. Variance via the computational formula
``(n*Σx² - (Σx)²) / n²`` stays in exact integer arithmetic until the one
final division.

Overflow budget: |value| <= ~9e5 keeps v_e4 < 2^33, v_e4² < 2^66 — too
big! — so sums-of-squares are computed on v_e2 (centi-precision) instead:
v_e2 < 2^27, v_e2² < 2^54, times a 10^3-row window < 2^64. The z-score
needs only ~2 significant digits of spread, so centi-precision of the
VARIANCE loses nothing; the mean keeps e4.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column | str],
    value_col: str,
    window_rows: int = 10,
    min_rows: int = 5,
    threshold: float = 2.5,
) -> DataFrame:
    """Append ``z`` (rounded e4) for events with >= ``min_rows`` PRIOR
    rows in the trailing window, null otherwise; ``is_anomaly`` when
    |z| > threshold. The window is the ``window_rows`` rows strictly
    BEFORE the current row (self-exclusion — an outlier must not inflate
    its own baseline)."""
    v_e2 = F.floor(F.col(value_col) * 100).cast("long")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window_rows, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(v_e2).over(w)  # exact integer frame sums
    s2 = F.sum(v_e2 * v_e2).over(w)
    mean_e2 = s1 / n
    # n*Σx² - (Σx)² is an exact long; one double division closes it
    var_e4 = (n * s2 - s1 * s1) / (n * n)
    z = (v_e2 - mean_e2) / F.sqrt(var_e4)
    return df.withColumn(
        "z",
        F.when((n >= min_rows) & (var_e4 > 0), F.round(z, 4)).otherwise(
            F.lit(None).cast("double")
        ),
    ).withColumn("is_anomaly", F.abs(F.col("z")) > threshold)
