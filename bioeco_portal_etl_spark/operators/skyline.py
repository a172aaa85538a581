"""2-D skyline (Pareto front): the rows no other row dominates —
minimize one measure, maximize the other (Börzsönyi, Kossmann &
Stocker 2001, "The Skyline Operator"). The canonical multi-criteria
shortlist: cheapest-for-the-size parts, fastest-for-the-accuracy
models, shortest-for-the-quality documents.

Plan shape — the sort-scan formulation, NOT the quadratic dominance
self-join: sorted by the minimized measure, a row is dominated iff the
running maximum of the maximized measure over STRICTLY cheaper rows
reaches it, or a same-price row strictly beats it. Two window functions
over one sort order — O(n log n) by shuffle-sort, no join at all — where
the textbook NOT EXISTS formulation is an O(n²) cross join. The window
partitions by nothing, so Spark runs it single-reducer at the final
step: acceptable because the skyline input is a FILTERED candidate set
in practice; for full-table fronts at 100 TB, pre-filter by a coarse
grid (only cells on the grid's own front can contain skyline points)
before this operator — the standard two-phase skyline.

Exactness: dominance is evaluated on integer-quantized measures
(``*_q``) supplied by the caller, so both engines compare identical
integers; ties keep ALL non-dominated duplicates (standard skyline
semantics: equal points don't dominate each other).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def skyline_2d(
    df: DataFrame, min_col: str, max_col: str
) -> DataFrame:
    """Rows where no other row has ``min_col`` <= and ``max_col`` >=
    with at least one strict — both columns must already be integer
    (quantize money to cents upstream). Preserves all input columns."""
    w_lower = (
        Window.orderBy(F.col(min_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tie = Window.partitionBy(min_col)
    best_lower = F.max(F.col(max_col)).over(w_lower)
    best_tie = F.max(F.col(max_col)).over(w_tie)
    dominated = (
        F.coalesce(best_lower >= F.col(max_col), F.lit(False))
    ) | (best_tie > F.col(max_col))
    return (
        df.withColumn("__dom", dominated)
        .filter(~F.col("__dom"))
        .drop("__dom")
    )


def duck_skyline_2d(source_sql: str, min_col: str, max_col: str) -> str:
    """DuckDB CTE body mirroring :func:`skyline_2d`; exposes ``sky`` with
    the source's columns. ``source_sql`` projects the integer measures."""
    return f"""__sk_src AS ({source_sql}),
__sk_flag AS (
  SELECT *,
         coalesce(
           max({max_col}) OVER (
             ORDER BY {min_col}
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             >= {max_col},
           false)
         OR max({max_col}) OVER (PARTITION BY {min_col}) > {max_col}
           AS dom
  FROM __sk_src
),
sky AS (
  SELECT * EXCLUDE (dom) FROM __sk_flag WHERE NOT dom
)"""
