"""Neighborhood (co-occurrence) similarity over a bipartite edge list —
the collaborative-filtering prep step: entities are similar when their
neighbor sets overlap (customers co-purchasing parts, users co-viewing
items, documents sharing entities).

Plan: the ONLY data-sized stage is the per-neighbor self-join, and its
fan-out is bounded by the neighbor's degree — the standard item-based CF
shape where Σ deg(item)² is the real cost. Degenerate hub items
(a "bestseller" bought by everyone) would alone contribute |U|² pairs,
so they are dropped by a ``max_item_degree`` guard BEFORE the self-join
(identical in spirit to the LSH max_bucket and containment max_df
guards: high-degree evidence is weak evidence, and the guard is what
makes the plan survive a skewed catalog at 100 TB). Per-entity degrees
are vertex-scaled aggregates; the final Jaccard is integer arithmetic
on (common, deg_a, deg_b).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def node_jaccard(
    edges: DataFrame,
    min_common: int = 2,
    max_item_degree: int = 64,
    pair_partitions: int | None = None,
) -> DataFrame:
    """(src_a, src_b, n_common, deg_a, deg_b, jaccard_e4) for src pairs
    sharing >= ``min_common`` distinct neighbors, via neighbors of degree
    <= ``max_item_degree``. jaccard = common / (deg_a + deg_b - common),
    floor-e4 on non-negative longs.

    ``pair_partitions`` widens the pair-expansion stage: the self-join's
    per-task output is Σ deg(dst)² over the dsts hashed to that task, so
    at the session's default shuffle width a 10× input can push a task's
    expanded pair stream past executor memory and into spill (the round-4
    probe measured 3.9×–13.9× run-to-run variance at 10× from exactly
    this). An explicit ``repartition(n, dst)`` pins the join width in the
    PLAN (a scoped conf can't — the catalog returns lazy frames that
    execute after the scope closes), shrinking per-task pair volume; the
    partial aggregate on (src_a, src_b) then shrinks each task's output
    to its distinct-pair count before the final exchange. Size it like a
    shuffle: total expanded pairs / (a few hundred MB of rows)."""
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    item_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("__idf"))
    pruned = e.join(
        item_deg.filter(F.col("__idf") <= max_item_degree).select("dst"),
        "dst",
    )
    if pair_partitions is not None:
        pruned = pruned.repartition(pair_partitions, "dst")
    pairs = (
        pruned.alias("a")
        .join(
            pruned.alias("b"),
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    da = deg.select(F.col("src").alias("src_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("src_b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(da, "src_a")
        .join(db, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "deg_a",
            "deg_b",
            F.expr(
                "(10000 * n_common) div (deg_a + deg_b - n_common)"
            ).alias("jaccard_e4"),
        )
    )
