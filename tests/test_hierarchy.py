"""flatten_hierarchy (operators/hierarchy.py): pointer-jumping transitive
closure — forest correctness, O(log depth) convergence on a deep chain,
and loud cycle failure (the recursive-CTE workload Spark SQL can't
express; oracle parity for the catalog fixture lives in
test_catalog_oracle via rel14_hierarchy_flatten)."""

from __future__ import annotations

import pytest

from bioeco_portal_etl_spark.operators.hierarchy import flatten_hierarchy


def test_forest_roots_depths(spark):
    nodes = spark.createDataFrame(
        [(1, None), (2, None), (8, 1), (9, 1), (15, 2), (60, 8), (61, 60)],
        "node long, parent long",
    )
    got = sorted(tuple(r) for r in flatten_hierarchy(nodes).collect())
    assert got == [
        (1, 1, 0),
        (2, 2, 0),
        (8, 1, 1),
        (9, 1, 1),
        (15, 2, 1),
        (60, 1, 2),
        (61, 1, 3),
    ]


def test_deep_chain_converges_logarithmically(spark):
    """A 200-deep chain must settle within ceil(log2(200)) + 1 = 9 pointer
    jumps — max_iter=9 passing IS the O(log D) convergence proof (a
    per-round propagation algorithm would need 200)."""
    n = 200
    rows = [(i, i - 1 if i > 0 else None) for i in range(n)]
    nodes = spark.createDataFrame(rows, "node long, parent long")
    out = {r.node: (r.root, r.depth) for r in
           flatten_hierarchy(nodes, max_iter=9).collect()}
    assert out[0] == (0, 0)
    assert out[n - 1] == (0, n - 1)
    assert out[137] == (0, 137)


def test_cycle_raises(spark):
    nodes = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 2), (9, None)], "node long, parent long"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        flatten_hierarchy(nodes, max_iter=8)
