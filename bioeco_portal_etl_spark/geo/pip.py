"""Point-in-polygon spatial join — the geo primitive Spark lacks, built as
bbox-blocked equi/broadcast join + exact even-odd ray cast in pure Column
algebra (no shapely round-trip, no UDF: the crossing test runs inside
whole-stage codegen).

The reference's spatial layer is polygon shapefiles + point surveys
(SURVEY.md §2.9; notebooks/index.Rmd:474-486 reads polygon layers, :434
builds point layers) — joining the two ("which monitoring area contains
this observation?") is the canonical downstream query the reference
delegates to GeoNode; this operator brings it into the engine.

Design:
  - Candidate generation: polygon bounding boxes. With a dimension-scale
    polygon set (protected areas, admin regions — thousands), the polygon
    table BROADCASTS and candidates come from a bbox theta-join evaluated
    map-side. For massive polygon sets, swap the broadcast for a grid-cell
    equi-join (polygons exploded to covered cells, points keyed by their
    cell) — same exact-filter second stage.
  - Exact test: even-odd ray casting, DIVISION-FREE form — the crossing
    inequality is cross-multiplied so both engines evaluate identical
    IEEE doubles (a division would hit engine-specific div-by-zero
    semantics on horizontal edges: Spark yields ±Inf, DuckDB NULL).
    Per-edge crossings accumulate as an integer left fold (associative,
    engine-exact).

Polygons are (id, xs array<double>, ys array<double>) open rings (the
closing edge last->first is implicit via modular indexing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _crossings(x: Column, y: Column, xs: Column, ys: Column) -> Column:
    """Number of polygon edges a rightward ray from (x, y) crosses."""
    n = F.size(xs)

    def edge(acc: Column, i: Column) -> Column:
        x1 = F.element_at(xs, i + 1)
        y1 = F.element_at(ys, i + 1)
        x2 = F.element_at(xs, (i + 1) % n + 1)
        y2 = F.element_at(ys, (i + 1) % n + 1)
        straddles = (y1 > y) != (y2 > y)
        # x < x1 + (x2-x1)(y-y1)/(y2-y1), cross-multiplied by (y2-y1):
        # the inequality flips with the sign of the multiplier, so compare
        # the sign of the determinant against the edge direction instead.
        det = (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1)
        crosses = straddles & ((det > 0) == (y2 > y1))
        return acc + F.when(crosses, 1).otherwise(0)

    return F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0), edge)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str,
    y_col: str,
    poly_id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """Inner join of points to the polygons containing them (even-odd
    rule). Output: all point columns + ``poly_id_col``. Points on an edge
    follow the ray-cast asymmetry (left/bottom edges in, right/top out) —
    consistently in both engines, since the arithmetic is identical."""
    p = polygons.select(
        F.col(poly_id_col),
        F.col(xs_col).alias("__xs"),
        F.col(ys_col).alias("__ys"),
        F.array_min(F.col(xs_col)).alias("__minx"),
        F.array_max(F.col(xs_col)).alias("__maxx"),
        F.array_min(F.col(ys_col)).alias("__miny"),
        F.array_max(F.col(ys_col)).alias("__maxy"),
    )
    x, y = F.col(x_col), F.col(y_col)
    cand = points.join(
        F.broadcast(p),
        (x >= F.col("__minx"))
        & (x <= F.col("__maxx"))
        & (y >= F.col("__miny"))
        & (y <= F.col("__maxy")),
    )
    inside = _crossings(x, y, F.col("__xs"), F.col("__ys")) % 2 == 1
    return cand.filter(inside).select(*points.columns, F.col(poly_id_col))
