"""Bitmap-index suitability audit: for candidate low-cardinality
columns, measure what a bitmap/RLE encoding would actually buy under
the table's physical order — the storage-layout question behind
CREATE BITMAP INDEX decisions and columnar RLE effectiveness (the same
clustering-vs-encoding interaction x24's z-order profile and x33's
zone maps measure for min-max pruning).

Per column: ndv (bitmap count), n_runs (maximal constant runs under the
given physical order — THE quantity RLE cost is linear in), and
rle_ratio_e6 = (1e6·n_runs) div n_rows: 1e6 means every row starts a
run (RLE useless), small means long runs (clustered; RLE collapses the
column). Runs are counted with one lag() window over the order key —
no shuffle beyond the sort, partial-combinable rollup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def bitmap_suitability(
    df: DataFrame, order_col: str, columns: list[str]
) -> DataFrame:
    """(column_name, n_rows, ndv, n_runs, rle_ratio_e6) per audited
    column, runs measured under ``order_col`` order."""
    out = None
    for c in columns:
        runs = df.select(
            F.col(c).cast("string").alias("v"), F.col(order_col).alias("o")
        ).select(
            "v",
            (
                F.lag("v").over(Window.orderBy("o")).isNull()
                | (F.lag("v").over(Window.orderBy("o")) != F.col("v"))
            )
            .cast("long")
            .alias("is_start"),
        )
        agg = runs.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("v")).alias("ndv"),
            F.sum("is_start").alias("n_runs"),
        ).select(
            F.lit(c).alias("column_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("ndv").cast("long").alias("ndv"),
            F.col("n_runs").cast("long").alias("n_runs"),
            F.expr("CAST((1000000 * n_runs) div n_rows AS BIGINT)").alias(
                "rle_ratio_e6"
            ),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def duck_bitmap_suitability(
    source_sql: str, order_col: str, columns: list[str]
) -> str:
    """DuckDB SELECT mirroring :func:`bitmap_suitability` (one row per
    column, same aliases, UNION ALL)."""
    parts = []
    for c in columns:
        parts.append(f"""
SELECT '{c}' AS column_name, count(*)::BIGINT AS n_rows,
       count(DISTINCT v)::BIGINT AS ndv,
       sum(is_start)::BIGINT AS n_runs,
       CAST((1000000 * sum(is_start)) // count(*) AS BIGINT)
         AS rle_ratio_e6
FROM (
  SELECT v, CASE WHEN lag(v) OVER (ORDER BY o) IS NULL
                   OR lag(v) OVER (ORDER BY o) <> v
            THEN 1 ELSE 0 END AS is_start
  FROM (SELECT CAST({c} AS VARCHAR) AS v, {order_col} AS o
        FROM ({source_sql}))
)""")
    return "\nUNION ALL\n".join(parts)
