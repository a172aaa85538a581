"""Incremental aggregate maintenance: keep a grouped aggregate current by
merging a small delta's PARTIAL aggregate into the stored one, instead of
rescanning the base table — the materialized-view pattern every nightly
100 TB rollup needs (rescanning petabytes to absorb a day's gigabytes is
the single biggest avoidable cost in a warehouse).

Works because the maintained state is MERGEABLE: count and sum combine by
+, min/max by least/greatest — the same algebra Spark's own partial
aggregation uses map-side, lifted to cross-batch granularity. (Averages
derive from (sum, count); distinct counts need a mergeable sketch —
sketches/kmv.py / hll.py plug into the same merge join.) Deletions/updates
ride along as CDC deltas with negated counts/sums for the removed state
(operators/cdc.py emits exactly that shape) — min/max are NOT
delete-mergeable and need a re-aggregate of affected groups only.

Spark-first: the merge is a keyed full-outer join of two
aggregate-cardinality tables (both far smaller than their inputs) —
broadcast-able when the delta touches few groups, never a base rescan.
Sums run as DECIMAL (exact, reassociation-free) so merged == recomputed
bit-for-bit; the caller casts the surface type.

Extension beyond the reference surface (the reference recomputes its
rollups from scratch each run — `notebooks/index.Rmd` is single-shot).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: maintained-state columns produced by partial_agg / consumed by merge_aggs
STATE_COLS = ("n_rows", "sum_val", "min_val", "max_val")


def partial_agg(df: DataFrame, keys: list[str], val_col: str) -> DataFrame:
    """Per-``keys`` mergeable state over ``val_col``: (keys..., n_rows,
    sum_val DECIMAL(28,6), min_val, max_val). Null values count toward
    n_rows but not sum/min/max (SQL aggregate semantics)."""
    v = F.col(val_col).cast("decimal(28,6)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v).alias("sum_val"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def merge_aggs(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial_agg outputs on ``keys`` (full outer — groups new
    in the delta appear, groups untouched by it pass through). Result is
    identical to partial_agg over the concatenated inputs."""
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, keys, "full_outer")

    return merged.select(
        *keys,
        (
            F.coalesce(F.col("b.n_rows"), F.lit(0))
            + F.coalesce(F.col("d.n_rows"), F.lit(0))
        ).alias("n_rows"),
        # SUM partials merge as coalesce(b+d, b, d): both present → add;
        # one side absent/all-null → the other; both null → NULL (a group
        # whose every value is NULL must keep sum NULL, exactly like a
        # from-scratch SUM — coalescing to 0 here silently fabricates a 0)
        F.coalesce(
            F.col("b.sum_val") + F.col("d.sum_val"),
            F.col("b.sum_val"),
            F.col("d.sum_val"),
        ).alias("sum_val"),
        F.least(
            F.coalesce(F.col("b.min_val"), F.col("d.min_val")),
            F.coalesce(F.col("d.min_val"), F.col("b.min_val")),
        ).alias("min_val"),
        F.greatest(
            F.coalesce(F.col("b.max_val"), F.col("d.max_val")),
            F.coalesce(F.col("d.max_val"), F.col("b.max_val")),
        ).alias("max_val"),
    )
