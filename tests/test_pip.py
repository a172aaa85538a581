"""point_in_polygon_join (geo/pip.py): even-odd ray cast correctness on
convex and CONCAVE rings (the bbox prefilter alone would misclassify the
concave notch), and plan hygiene (no Python stages)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.geo.pip import point_in_polygon_join


def _join(spark, pts, polys):
    pdf = spark.createDataFrame(pts, "pid int, x double, y double")
    gdf = spark.createDataFrame(
        polys, "poly_id int, xs array<double>, ys array<double>"
    )
    out = point_in_polygon_join(pdf, gdf, "x", "y")
    return sorted((r.pid, r.poly_id) for r in out.collect())


def test_concave_ring(spark):
    # L-shape: unit square [0,4]x[0,4] minus the notch [2,4]x[2,4]
    ell = [(0, [0.0, 4.0, 4.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 4.0, 4.0])]
    pts = [
        (1, 1.0, 1.0),   # inside the fat part
        (2, 3.0, 3.0),   # inside the NOTCH -> outside (bbox says inside)
        (3, 1.0, 3.0),   # inside the thin arm
        (4, 5.0, 1.0),   # outside bbox
        (5, 3.0, 1.0),   # inside lower arm
    ]
    assert _join(spark, pts, ell) == [(1, 0), (3, 0), (5, 0)]


def test_diamond_and_multiple_polys(spark):
    polys = [
        (0, [2.0, 10.0, 18.0, 10.0], [10.0, 18.0, 10.0, 2.0]),  # diamond
        (1, [20.0, 30.0, 30.0, 20.0], [20.0, 20.0, 30.0, 30.0]),  # square
    ]
    pts = [
        (1, 10.0, 10.0),  # diamond center
        (2, 3.0, 17.0),   # in diamond bbox, outside diamond
        (3, 25.0, 25.0),  # square center
        (4, 10.0, 30.0),  # nowhere
    ]
    assert _join(spark, pts, polys) == [(1, 0), (3, 1)]


def test_no_python_stages_and_partition_invariance(spark):
    from bioeco_portal_etl_spark import catalog
    from tests.conftest import SF_SMOKE

    df = catalog.queries()["g10_point_in_polygon"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    base = [tuple(r) for r in df.collect()]
    assert len(base) > 0


def _join_grid(spark, pts, polys, cell_size):
    from bioeco_portal_etl_spark.geo.pip import point_in_polygon_join_grid

    pdf = spark.createDataFrame(pts, "pid int, x double, y double")
    gdf = spark.createDataFrame(
        polys, "poly_id int, xs array<double>, ys array<double>"
    )
    out = point_in_polygon_join_grid(pdf, gdf, "x", "y", cell_size=cell_size)
    return sorted((r.pid, r.poly_id) for r in out.collect())


def test_grid_tier_matches_broadcast_tier(spark):
    """Grid equi-join tier == broadcast tier row-for-row, across cell sizes
    that split polygons over 1, several, and many cells — including
    NEGATIVE coordinates (floor-division cell keys, not truncation)."""
    polys = [
        (0, [2.0, 10.0, 18.0, 10.0], [10.0, 18.0, 10.0, 2.0]),   # diamond
        (1, [20.0, 30.0, 30.0, 20.0], [20.0, 20.0, 30.0, 30.0]),  # square
        (2, [-15.0, -5.0, -5.0, -15.0], [-15.0, -15.0, -5.0, -5.0]),  # negative
        (3, [0.0, 4.0, 4.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]),  # L
    ]
    pts = [
        (1, 10.0, 10.0),
        (2, 3.0, 17.0),
        (3, 25.0, 25.0),
        (4, 10.0, 30.0),
        (5, -10.0, -10.0),   # inside the negative square
        (6, -15.5, -10.0),   # just outside it
        (7, 1.0, 1.0),
        (8, 3.0, 3.0),       # in the L notch -> outside
        (9, 0.0, 0.0),       # on the L's bottom-left corner (edge rule)
    ]
    want = _join(spark, pts, polys)
    for cell in (50.0, 10.0, 3.0):
        assert _join_grid(spark, pts, polys, cell) == want, cell


def test_grid_tier_no_polygon_broadcast(spark):
    """The point of the grid tier: the polygon side must NOT broadcast —
    candidates come from a shuffled hash equi-join on the cell key (both
    sides exchange by cell), and the exact stage stays codegen."""
    from bioeco_portal_etl_spark import catalog
    from tests.conftest import SF_SMOKE

    qs = catalog.queries()
    df = qs["g11_pip_grid"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "BroadcastNestedLoop" not in plan
    assert "ShuffledHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # and the two tiers agree on the real fixture
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        tuple(r) for r in qs["g10_point_in_polygon"](spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0
