"""Skew mitigation (SURVEY.md §4.3, repo north star: 100 TB posture).

AQE's skew-join splitting handles joins; SALTED AGGREGATION handles the other
hot spot — a groupBy where a handful of keys own most rows (the classic
boilerplate-document / null-key / celebrity-entity skew). Two-phase plan:

    scan -> [key, salt = hash(row) % S] partial agg (S-way split of hot keys)
         -> shuffle on (key, salt)   <- no single reducer owns a hot key
         -> re-agg on key            <- S rows per key, trivial

Works for ALGEBRAIC aggregates (those with a merge half: sum/count/min/max/
bool_or, and avg decomposed as sum+count). Catalyst already does map-side
partial aggregation INSIDE a partition; salting additionally splits a hot
key ACROSS reducers, which partials alone cannot.

``salted_agg`` takes (first_phase, second_phase) aggregate pairs so callers
state the decomposition explicitly — no magic rewriting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int = 16) -> DataFrame:
    """Row salt from monotonically_increasing_id — spreads IDENTICAL rows
    across buckets too (a row-content hash would send 100M copies of one
    boilerplate row to a single salt, defeating the split). Salt placement
    never affects results: the merge phase re-aggregates across salts, so
    per-attempt id stability is irrelevant to correctness."""
    if SALT_COL in df.columns:
        raise ValueError(f"input already has a {SALT_COL!r} column")
    return df.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    phases: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``phases[name] = (partial_expr, merge_expr)`` where partial_expr runs in
    the salted groupBy and merge_expr re-aggregates the per-salt partials by
    the true key; merge_expr must reference the partial's column by ``name``.

    Example (count + sum + max):
        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),  F.sum("n")),
            "s":   (F.sum("v"),         F.sum("s")),
            "mx":  (F.max("v"),         F.max("mx")),
        })
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[expr.alias(name) for name, (expr, _) in phases.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in phases.items()]
    )
