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
from pyspark.sql import Column, DataFrame, Window

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


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top: int = 5,
) -> DataFrame:
    """Pre-join skew diagnosis — the report you read BEFORE reaching for
    salted_join/AQE hints: per-key row counts on both sides and the
    estimated join output (n_left * n_right), ranked by that estimate.
    A single key carrying a large share of est_out is the shuffle
    hotspot that stalls the straggler task.

    Cost: one partial-aggregated groupBy per side (count-shaped, tiny
    shuffle), then an outer join of two key-cardinality tables — never
    touches the fact-sized join itself, which is the point of running
    the diagnosis first. Output: top-``top`` keys by est_out
    (key, n_left, n_right, est_out, rank)."""
    lc = left.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    both = (
        lc.join(rc, "key", "full")
        .select(
            "key",
            F.coalesce(F.col("n_left"), F.lit(0)).cast("long").alias("n_left"),
            F.coalesce(F.col("n_right"), F.lit(0)).cast("long").alias("n_right"),
        )
        .withColumn(
            "est_out", (F.col("n_left") * F.col("n_right")).cast("long")
        )
    )
    # Top-N via sort+limit (TakeOrderedAndProject — per-partition top-N
    # then a merge of N-row heaps), NOT a global row_number window, which
    # would single-task the whole key table; the rank window then runs
    # over only the ``top`` surviving rows.
    w = Window.orderBy(F.desc("est_out"), F.asc("key"))
    return (
        both.orderBy(F.desc("est_out"), F.asc("key"))
        .limit(top)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
