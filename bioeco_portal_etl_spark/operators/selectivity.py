"""Multi-column histogram cardinality estimation — optimizer statistics
as a first-class operator.

Cost-based optimizers pick join orders and strategies from estimated
row counts; single-column histograms multiply per-column selectivities
and silently assume independence, which correlated columns (customer
and order date, region and product) violate by orders of magnitude. The
standard fix is a small MULTI-column grid histogram over the correlated
pair. This module builds that grid and evaluates predicate rectangles
against it, returning BOTH bounds the grid can actually prove:

    est_lo  = rows in cells FULLY INSIDE the predicate rectangle
    est_hi  = rows in cells INTERSECTING it

so est_lo <= actual <= est_hi always holds (cells partition the data;
interior cells contribute entirely, boundary cells somewhere between 0
and fully). Reporting a bracket instead of a point estimate makes the
audit self-certifying — the catalog pairing computes actual alongside
and the containment is checkable by an oracle, the same
certified-approximation posture as the histogram quantiles (histq) and
heavy hitters (tx23).

Scale shape: the grid is ONE partial-combinable aggregate over floor-
quantized keys (cells ~ (range/step)^2 rows, data-independent);
predicate evaluation touches only the grid. All integer arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grid_histogram_2d(
    df: DataFrame, a_col: str, b_col: str, a_step: int, b_step: int
) -> DataFrame:
    """(ga, gb, cnt): counts per 2-D cell, cell = (a div a_step,
    b div b_step). Inputs must be non-negative integers (the engine's
    div/floor-division agreement domain)."""
    return df.groupBy(
        F.expr(f"{a_col} div {a_step}").alias("ga"),
        F.expr(f"{b_col} div {b_step}").alias("gb"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def selectivity_bounds(
    grid: DataFrame,
    a_step: int,
    b_step: int,
    predicates: list[tuple[str, int, int, int, int]],
) -> DataFrame:
    """Evaluate predicate rectangles [(name, a_lo, a_hi, b_lo, b_hi)]
    (closed intervals) against the grid: (predicate, est_lo, est_hi,
    cells_full, cells_partial). Pure projection + one aggregate over the
    grid per predicate — the base table is never rescanned."""
    per = []
    for name, a_lo, a_hi, b_lo, b_hi in predicates:
        a0, a1 = F.col("ga") * a_step, (F.col("ga") + 1) * a_step - 1
        b0, b1 = F.col("gb") * b_step, (F.col("gb") + 1) * b_step - 1
        intersects = (a0 <= a_hi) & (a1 >= a_lo) & (b0 <= b_hi) & (b1 >= b_lo)
        inside = (a0 >= a_lo) & (a1 <= a_hi) & (b0 >= b_lo) & (b1 <= b_hi)
        per.append(
            grid.select(
                F.lit(name).alias("predicate"),
                F.when(inside, F.col("cnt")).otherwise(F.lit(0)).alias("lo"),
                F.when(intersects, F.col("cnt"))
                .otherwise(F.lit(0))
                .alias("hi"),
                inside.cast("long").alias("full"),
                (intersects & ~inside).cast("long").alias("part"),
            )
        )
    u = per[0]
    for p in per[1:]:
        u = u.unionByName(p)
    return u.groupBy("predicate").agg(
        F.sum("lo").alias("est_lo"),
        F.sum("hi").alias("est_hi"),
        F.sum("full").alias("cells_full"),
        F.sum("part").alias("cells_partial"),
    )


def duck_selectivity(
    source_sql: str,
    a_col: str,
    b_col: str,
    a_step: int,
    b_step: int,
    predicates: list[tuple[str, int, int, int, int]],
) -> str:
    """DuckDB CTE body mirroring grid + bounds + ACTUAL row counts;
    exposes ``selest(predicate, est_lo, est_hi, cells_full,
    cells_partial, actual_rows)``."""
    evals = []
    for name, a_lo, a_hi, b_lo, b_hi in predicates:
        inter = (
            f"(ga * {a_step} <= {a_hi} AND (ga + 1) * {a_step} - 1 >= {a_lo}"
            f" AND gb * {b_step} <= {b_hi}"
            f" AND (gb + 1) * {b_step} - 1 >= {b_lo})"
        )
        inside = (
            f"(ga * {a_step} >= {a_lo} AND (ga + 1) * {a_step} - 1 <= {a_hi}"
            f" AND gb * {b_step} >= {b_lo}"
            f" AND (gb + 1) * {b_step} - 1 <= {b_hi})"
        )
        evals.append(
            f"""SELECT '{name}' AS predicate,
       sum(CASE WHEN {inside} THEN cnt ELSE 0 END)::BIGINT AS est_lo,
       sum(CASE WHEN {inter} THEN cnt ELSE 0 END)::BIGINT AS est_hi,
       sum(CASE WHEN {inside} THEN 1 ELSE 0 END)::BIGINT AS cells_full,
       sum(CASE WHEN {inter} AND NOT {inside} THEN 1 ELSE 0 END)::BIGINT
         AS cells_partial
FROM __se_grid"""
        )
    actuals = " UNION ALL ".join(
        f"""SELECT '{name}' AS predicate, count(*)::BIGINT AS actual_rows
FROM __se_src
WHERE {a_col} BETWEEN {a_lo} AND {a_hi}
  AND {b_col} BETWEEN {b_lo} AND {b_hi}"""
        for name, a_lo, a_hi, b_lo, b_hi in predicates
    )
    bounds = " UNION ALL ".join(evals)
    return f"""__se_src AS ({source_sql}),
__se_grid AS (
  SELECT {a_col} // {a_step} AS ga, {b_col} // {b_step} AS gb,
         count(*) AS cnt
  FROM __se_src GROUP BY ga, gb
),
__se_bounds AS ({bounds}),
__se_actual AS ({actuals}),
selest AS (
  SELECT b.predicate, b.est_lo, b.est_hi, b.cells_full, b.cells_partial,
         a.actual_rows
  FROM __se_bounds b
  JOIN __se_actual a ON a.predicate = b.predicate
)"""
