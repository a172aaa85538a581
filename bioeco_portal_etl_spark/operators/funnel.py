"""Ordered-funnel analysis: per entity, the earliest time each step of an
ordered event sequence completes, where step i only counts AFTER step i-1's
completion (the product-analytics "signup → view → purchase" question).

Plan: ONE pass — pivot the per-user event stream into per-step ordered
timestamp arrays with a single ``groupBy(user)`` (min-heap semantics via
``array_sort(collect_list)`` per step, conditional on event type), then
resolve the cascade ``t_i = first element of step_i's array > t_{i-1}``
with ``F.filter`` + ``try_element_at`` (NULL on empty — ANSI-safe: the
default Spark 4 session runs ANSI on, where plain element_at THROWS on
a stalled funnel's empty candidate array) — pure Column algebra, no per-step
joins. The naive formulation (one self-join per funnel step) shuffles the
event table S times; this shuffles it ONCE regardless of funnel length,
the property that matters when the funnel runs over a 100 TB clickstream.

Conversion output: per user, the step reached (0..S) and each step's
completion time (epoch µs, null once the funnel stalls) — aggregate
downstream for the usual step-counts report.

Determinism: timestamps reduce to epoch-µs longs before any comparison;
ties within a step resolved by the sort on (ts, tiebreak) encoded into a
single sortable struct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user funnel resolution over ``steps`` (ordered event types).
    Output: (user, steps_completed, t_step1..t_stepN epoch-µs longs)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == s, ts_us))
        ).alias(f"__a{i}")
        for i, s in enumerate(steps)
    ]
    g = df.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    # cascade: t0 = min(step0 times); t_i = first step_i time > t_{i-1}
    t_cols: list[F.Column] = []
    prev = None
    for i in range(len(steps)):
        arr = F.col(f"__a{i}")
        if prev is None:
            t = F.try_element_at(arr, F.lit(1))
        else:
            t = F.try_element_at(F.filter(arr, lambda x: x > prev), F.lit(1))
        t_cols.append(t.alias(f"t_step{i + 1}"))
        prev = t
    out = g.select("user", *t_cols)
    completed = sum(
        F.col(f"t_step{i + 1}").isNotNull().cast("int")
        for i in range(len(steps))
    )
    return out.select(
        "user", completed.alias("steps_completed"), *[f"t_step{i + 1}" for i in range(len(steps))]
    )


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_us: int,
) -> DataFrame:
    """Timeout funnel (ClickHouse ``windowFunnel`` semantics): per user,
    the MAXIMUM number of consecutive funnel steps completed where every
    step happens within ``window_us`` of the chain's FIRST step — and
    the maximum ranges over ALL candidate chain starts, not just the
    user's earliest step-1 event (the earliest start can be the worst
    one when a later retry converts; plain :func:`funnel_steps` has no
    deadline and so never needs to reconsider its start).

    Same one-shuffle shape as funnel_steps: a single groupBy(user)
    collects per-step ordered timestamp arrays, then the start-candidate
    scan is an ``F.transform`` over the step-1 array with the chain
    resolved by nested array filters — per-user work is
    O(|step1| * chain-depth * log) inside the row, zero extra shuffles,
    which is what lets the deadline semantics run over a clickstream at
    corpus scale.

    Output: (user, funnel_level) — 0 if the user never fired step 1."""
    if len(steps) < 2:
        raise ValueError("window_funnel needs >= 2 steps")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == s, ts_us))
        ).alias(f"__a{i}")
        for i, s in enumerate(steps)
    ]
    g = df.groupBy(F.col(user_col).alias("user")).agg(*aggs)

    def _pred(p: F.Column, d: F.Column):
        # a factory, NOT default-arg capture: PySpark derives the HOF's
        # arity from the lambda signature, so defaulted params would be
        # mistaken for extra lambda variables
        return lambda x: (x > p) & (x <= d)

    def chain_len(t1: F.Column) -> F.Column:
        deadline = t1 + F.lit(window_us)
        level = F.lit(1)
        prev = t1
        for i in range(1, len(steps)):
            prev = F.try_element_at(
                F.filter(F.col(f"__a{i}"), _pred(prev, deadline)),
                F.lit(1),
            )
            level = F.when(prev.isNotNull(), F.lit(i + 1)).otherwise(level)
            # once a step is missed the chain stops: guard later levels
            # by the null propagating through `prev`
        return level

    lvl = F.when(
        F.size(F.col("__a0")) > 0,
        F.array_max(F.transform(F.col("__a0"), chain_len)),
    ).otherwise(F.lit(0))
    return g.select("user", lvl.cast("long").alias("funnel_level"))
