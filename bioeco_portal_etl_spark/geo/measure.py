"""Polygon measurement — shoelace area + centroid as pure Column algebra.

Completes the geo family (SURVEY.md §2.9 G1-G8 construct/convert/union
geometries; geo/pip.py tests containment) with the measurement primitives
a spatial pipeline reports on: ring area and centroid. Same representation
as pip.py: (xs array<double>, ys array<double>) open rings, closing edge
implicit via modular indexing.

Engine-exactness: all three shoelace sums (S = Σ cross_i, Sx, Sy) are
LEFT FOLDS over the vertex index in ascending order, seeded with 0.0 —
``F.aggregate(sequence(...))`` on the Spark side, ``list_reduce(
list_prepend(0.0, list_transform(range(...))))`` on the DuckDB side —
with the per-term expression written identically, so both engines produce
the same IEEE doubles and floor-e4 quantization hash-matches (the g10
crossing fold uses the same trick with integers). A division-based
formula evaluated in a different order would drift in the last ulp.

Scale: per-row Column arithmetic inside whole-stage codegen — no UDF, no
shuffle, cost linear in total vertex count exactly like a string column
of the same size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _folds(xs: Column, ys: Column) -> tuple[Column, Column, Column]:
    """(S, Sx, Sy): S = Σ (x_i y_j − x_j y_i) with j = (i+1) mod n;
    Sx = Σ (x_i + x_j)·cross_i; Sy = Σ (y_i + y_j)·cross_i."""
    n = F.size(xs)

    def x(i):
        return F.element_at(xs, i + 1)

    def y(i):
        return F.element_at(ys, i + 1)

    def nxt(i):
        return (i + 1) % n

    def cross(i):
        return x(i) * y(nxt(i)) - x(nxt(i)) * y(i)

    idx = F.sequence(F.lit(0), n - 1)
    s = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + cross(i))
    sx = F.aggregate(
        idx, F.lit(0.0), lambda acc, i: acc + (x(i) + x(nxt(i))) * cross(i)
    )
    sy = F.aggregate(
        idx, F.lit(0.0), lambda acc, i: acc + (y(i) + y(nxt(i))) * cross(i)
    )
    return s, sx, sy


def polygon_area_centroid(
    polys: DataFrame,
    poly_id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """(poly_id, area_e4, cx_e4, cy_e4): shoelace area (always positive,
    either ring orientation) and centroid, floor-e4 quantized. Degenerate
    rings (signed area 0 — collinear or empty) yield NULL centroid and
    area_e4 = 0 rather than a division blow-up."""
    s, sx, sy = _folds(F.col(xs_col), F.col(ys_col))
    return polys.select(
        F.col(poly_id_col),
        F.floor(F.abs(s) / 2.0 * 10000).cast("long").alias("area_e4"),
        F.when(s != 0.0, F.floor(sx / (3.0 * s) * 10000).cast("long")).alias(
            "cx_e4"
        ),
        F.when(s != 0.0, F.floor(sy / (3.0 * s) * 10000).cast("long")).alias(
            "cy_e4"
        ),
    )
