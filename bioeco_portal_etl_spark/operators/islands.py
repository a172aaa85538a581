"""Gaps-and-islands: collapse consecutive same-valued runs per key.

The classic SQL idiom (Itzik Ben-Gan): two window row_numbers — one over
the full key-ordered stream, one additionally partitioned by the run
value — differ by a constant WITHIN a run and change across runs, so
``rn_all - rn_by_value`` is a stable island id, and one groupBy collapses
each island to a row. Complements sessionize (operators/sessions.py),
which breaks runs on TIME gaps; islands break on VALUE changes.

Scale shape: both windows hash-partition on the same key, so Catalyst
plans ONE exchange and two in-partition sorts; the closing groupBy reuses
the same hash partitioning (island keys are prefixed by the window key).
Zero UDFs, zero driver state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def islands(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    order_cols: list[Column | str],
) -> DataFrame:
    """One row per maximal run of equal ``value_col`` per key:
    (key..., value, run_start, run_end, n_rows) where run_start/run_end
    are the first/last order position's FIRST order column value.

    ``order_cols`` must be a deterministic total order within each key
    (add a tiebreaker id — same contract as every window op here).
    """
    w_all = Window.partitionBy(*key_cols).orderBy(*order_cols)
    w_val = Window.partitionBy(*key_cols, value_col).orderBy(*order_cols)
    first_order = order_cols[0]
    fo = F.col(first_order) if isinstance(first_order, str) else first_order
    grp = (F.row_number().over(w_all) - F.row_number().over(w_val)).alias("__island")
    return (
        df.select(*key_cols, value_col, fo.alias("__o"), grp)
        .groupBy(*key_cols, value_col, "__island")
        .agg(
            F.min("__o").alias("run_start"),
            F.max("__o").alias("run_end"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .drop("__island")
    )
