"""Synchronous label propagation for community detection (Raghavan,
Albert & Kumara 2007, "Near linear time algorithm to detect community
structures in large-scale networks" — public algorithm; the same LPA
GraphX/igraph ship).

Each round, every node adopts the most frequent label among its
neighbors. Classic LPA breaks frequency ties randomly; for an
engine-exact surface we pin the deterministic variant: ties break on the
SMALLEST label (the same min-id convention connected_components uses), and
rounds are synchronous (all nodes update from the round-(i-1) labels).
Community structure stabilizes in a handful of rounds on modular graphs;
the operator runs a FIXED round count, so its output is a well-defined
function of the input on both engines whether or not a fixpoint was
reached (deterministic-LPA fixpoints can 2-cycle on bipartite-ish
structures, so bounded rounds are the only portable contract).

Plan shape per round (the CC/PageRank recipe):
  edges JOIN labels ON dst   -- shuffles the O(V) label table; the O(E)
                             -- edge list is persisted and reused
  groupBy (node, label)      -- map-side combinable count
  row_number window          -- argmax per node: (count DESC, label ASC)
At 100 TB: per-round cost is one label-table shuffle + one combinable
aggregate — edges never re-shuffle after the initial partition-by-dst,
the same iteration structure PageRank uses (graph/pagerank.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    persist_edges: bool = True,
    pre_symmetrized: bool = False,
) -> DataFrame:
    """(node, label) after ``rounds`` synchronous updates; initial label =
    own node id. ``edges`` is an undirected edge list given as (src, dst)
    long columns — symmetrized and self-loop-stripped here. Isolated
    nodes don't appear (no edges = no community evidence).

    ``persist_edges`` pins the symmetrized O(E) list (and with it the
    upstream edge derivation — often an expensive self-join, e.g. gr7's
    orders⋈orders co-activity graph) so each round pays ONE label
    shuffle, not a lineage replay; the pagerank.py pattern. Turn off for
    one-shot tiny graphs."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if pre_symmetrized:
        # caller certifies the list already contains both directions of
        # every edge, deduplicated (e.g. a persisted co-activity join a
        # downstream scorer also consumes — gr20 shares ONE materialized
        # frame instead of replaying the self-join per consumer)
        sym = e.repartition("dst")
    else:
        sym = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .repartition("dst")
        )
    if persist_edges:
        sym = sym.persist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("__c"), F.asc("label"))
    for _ in range(rounds):
        nbr = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = (
            nbr.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
        )
    return labels


def community_sizes(labels: DataFrame, top_k: int = 20) -> DataFrame:
    """(community, size) for the ``top_k`` largest communities — size
    DESC, community ASC tie-break."""
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), F.asc("community"))
        .limit(top_k)
    )


def duck_label_propagation(edges_select: str, rounds: int = 2) -> str:
    """DuckDB mirror of :func:`label_propagation`: unrolled CTE chain
    (synchronous rounds are plain self-contained queries — no recursion
    needed). ``edges_select`` must project src, dst; exposes
    ``l{rounds}(node, label)``."""
    parts = [
        f"eraw AS ({edges_select})",
        "eflt AS (SELECT src, dst FROM eraw WHERE src <> dst)",
        "sym AS (SELECT src, dst FROM eflt UNION SELECT dst, src FROM eflt)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""n{i} AS (
  SELECT s.src AS node, l.label, count(*)::BIGINT AS c
  FROM sym s JOIN l{i - 1} l ON l.node = s.dst
  GROUP BY s.src, l.label
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label) AS rn
    FROM n{i})
  WHERE rn = 1
)"""
        )
    return ",\n".join(parts)
