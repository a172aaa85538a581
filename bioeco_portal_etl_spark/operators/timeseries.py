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


EWMA_SCHEMA = "user_id long, event_id long, ewma_e4 long"


def _ewma_group(pdf, shift: int):
    import pandas as pd

    pdf = pdf.sort_values(["t", "event_id"])
    s = None
    out = []
    for v in pdf["v_e4"]:
        # integer EWMA with alpha = 2^-shift: s += floor((v - s) / 2^shift)
        # — Python // floors, matching DuckDB's //; no float state ever.
        s = int(v) if s is None else s + (int(v) - s) // (1 << shift)
        out.append(s)
    return pd.DataFrame(
        {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "ewma_e4": out}
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    alpha_shift: int = 2,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the RECURRENCE tier
    of time-series smoothing: ``s_t = s_{t-1} + (v_t - s_{t-1}) * alpha``
    with ``alpha = 2^-alpha_shift``. A running EWMA is inherently
    sequential per key (each state depends on the previous), which no
    window frame expresses — exactly the applyInPandas grouped-map case
    (same policy tier as operators/resample.py): ONE hash(key) shuffle,
    per-group sequential scan, state = one long.

    Engine-exactness: values quantize to e4 longs first; the recurrence
    uses FLOOR division by 2^alpha_shift (Python ``//``). NB: DuckDB's
    integer ``//`` TRUNCATES toward zero on negatives, so the oracle must
    spell floor division as ``floor(delta / 4.0)`` (exact in double at e4
    scale) — with that, the integer state trajectory replays bit-for-bit,
    where a float EWMA would accumulate engine-specific rounding each step.

    Output: (user_id, event_id, ewma_e4)."""
    prepared = df.select(
        F.col(key_col).alias("user_id"),
        F.col(tiebreak_col).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("t"),
        F.floor(F.col(value_col) * 10000).cast("long").alias("v_e4"),
    )
    from bioeco_portal_etl_spark.operators.grouped_map import (
        map_complete_groups,
    )

    def batch(pdf):
        return _ewma_batch(pdf, alpha_shift)

    # partition-batched tier (grouped_map.py): one Python call per Arrow
    # batch instead of per key; the sequential recurrence runs as ONE row
    # loop with state reset at group boundaries — trajectory identical to
    # the per-group reference (_ewma_group, pinned by test)
    return map_complete_groups(
        prepared, "user_id", ["t", "event_id"], batch, EWMA_SCHEMA
    )


def _ewma_batch(pdf, shift: int):
    import pandas as pd

    keys = pdf["user_id"].to_numpy()
    vs = pdf["v_e4"].to_numpy()
    out = [0] * len(vs)
    s = 0
    prev = None
    for i in range(len(vs)):
        k = keys[i]
        v = int(vs[i])
        if k != prev:
            s = v
            prev = k
        else:
            # integer EWMA, alpha = 2^-shift: Python // floors (DuckDB
            # oracle spells floor(delta / 4.0) — see ewma docstring)
            s = s + (v - s) // (1 << shift)
        out[i] = s
    return pd.DataFrame(
        {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "ewma_e4": out}
    )


def rolling_slope(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    window_rows: int = 10,
    scale: int = 10_000,
) -> DataFrame:
    """Rolling least-squares trend per key: the OLS slope of the last
    ``window_rows`` quantized values against their sequence index — the
    streaming-dashboard "is this metric trending up" statistic, exact
    across engines because every sufficient statistic is an integer.

    y is floor-quantized to ``scale`` in the scan stage; x is the per-key
    row_number. All five rolling sums (n, Σx, Σy, Σxy, Σx²) ride ONE
    window frame over the same (key) exchange; the slope

        slope_e6 = floor(1e6 · (n·Σxy − Σx·Σy) / (n·Σx² − Σx²sum))

    does its single IEEE division inside a floor (PORTABILITY.md), with a
    NULL surface while the window still has < 2 points or zero variance.

    Scale: one hash exchange + in-partition sort, rolling frames are
    O(1)-update streaming aggregates; nothing here is corpus-sized."""
    wseq = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    wfrm = wseq.rowsBetween(-(window_rows - 1), 0)
    y = F.floor(F.col(value_col) * scale).cast("long")
    base = df.select(
        F.col(key_col),
        F.col(order_col),
        F.col(tiebreak_col),
        F.row_number().over(wseq).cast("long").alias("__x"),
        y.alias("__y"),
    )
    n = F.count(F.lit(1)).over(wfrm)
    sx = F.sum("__x").over(wfrm)
    sy = F.sum("__y").over(wfrm)
    sxy = F.sum(F.col("__x") * F.col("__y")).over(wfrm)
    sxx = F.sum(F.col("__x") * F.col("__x")).over(wfrm)
    return base.select(
        key_col,
        order_col,
        tiebreak_col,
        F.col("__x").alias("x"),
        F.col("__y").alias("y_e"),
        n.alias("__n"),
        sx.alias("__sx"),
        sy.alias("__sy"),
        sxy.alias("__sxy"),
        sxx.alias("__sxx"),
    ).select(
        key_col,
        order_col,
        tiebreak_col,
        "x",
        "y_e",
        F.expr(
            # 1e6 (not 1000000.0): a .0 literal parses as DECIMAL in
            # DuckDB and rounds differently — PORTABILITY.md
            "CASE WHEN __n >= 2 AND __n * __sxx - __sx * __sx <> 0 THEN "
            "CAST(floor(1e6 * (__n * __sxy - __sx * __sy) "
            "/ (__n * __sxx - __sx * __sx)) AS BIGINT) END"
        ).alias("slope_e6"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Duration-weighted mean per key: each observation's value holds
    until the NEXT observation (step interpolation), so the mean weights
    by holding time instead of sample count — the correct average for
    irregularly-sampled state (prices, sensor levels, account balances),
    where the plain mean over-weights bursts of rapid updates. The last
    observation in a key has no successor and is excluded (it holds for
    an unknown horizon; the standard left-closed convention).

    Output per key: (key..., n_obs, span_secs, twa_e4) with twa_e4 =
    (10^4 * sum(value_cents * hold_secs)) div sum(hold_secs) — all
    integers, engine-exact: cents via floor(value*100), holding time as
    ONE floor of the microsecond difference to whole seconds (never two
    independent floors of the endpoints). Sub-second gaps weigh 0; a key
    whose every gap is sub-second has span 0 and a NULL twa (guarded
    division — Spark's div would return NULL, DuckDB's // would raise).

    Scale shape: ONE window (lead over the key partition — keys bound
    partition size; never a global sort) + one partial-combinable
    aggregate. Weighted sums stay under int64 for ~1e9 cent-seconds per
    key, far above the fixture and typical per-key densities."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    us_next = F.unix_micros(F.lead(ts_col, 1).over(w).cast("timestamp_ltz"))
    stepped = df.select(
        *key_cols,
        F.floor(F.col(value_col) * 100).cast("long").alias("__cents"),
        (us_next - us).alias("__du"),
    ).filter(F.col("__du").isNotNull())
    stepped = stepped.select(
        *key_cols, "__cents", F.expr("__du div 1000000").alias("__hold")
    )
    return stepped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__hold").alias("span_secs"),
        F.expr(
            "CAST(CASE WHEN sum(__hold) > 0 THEN"
            " (10000 * sum(__cents * __hold)) div sum(__hold) END AS BIGINT)"
        ).alias("twa_e4"),
    )
