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


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: the manual form of AQE's skew-join split,
    for when the skew lives in ONE hot key so heavy that even AQE's
    partition splitting leaves a straggler (AQE splits oversized shuffle
    FILES; a single hot key hashing to one reducer still serializes its
    probe side), or when AQE is off (streaming micro-batches).

        big:  + salt = row-id % buckets      (each hot-key row picks a
                                              bucket; rows spread evenly)
        dim:  × explode(0..buckets-1)        (every dim row replicated
                                              once per bucket)
        join ON (key, salt)                  (hot key now occupies
                                              `buckets` reducers)

    Result set is EXACTLY the plain join's (each big row meets each
    matching dim row exactly once — at its own salt); the dim side pays a
    `buckets`× replication, which is the standard trade: replicate the
    small-but-not-broadcastable side, split the skewed side. ``how``
    supports inner/left (right/full would need unmatched-dim bookkeeping
    across salts — out of scope for the skew pattern, which puts facts on
    the left)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = with_salt(big, buckets)
    if SALT_COL in dim.columns:
        raise ValueError(f"dim already has a {SALT_COL!r} column")
    exploded = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    return salted.join(exploded, [key, SALT_COL], how).drop(SALT_COL)
