"""Slowly-changing-dimension type-2 merge as pure dataflow.

The reference's sync layer overwrites (K7) or upserts in place (K5/K6 —
SCD1: history lost). Warehouse deployments of the same pipeline keep
HISTORY: an update to a tracked attribute closes the current row
(valid_to = effective date) and opens a new one. Re-expressed without
mutation: one broadcast-or-hash join of current rows against updates plus
unions — the output IS the new dimension table, written atomically via
partition overwrite or staged JDBC merge downstream.

Plan shape at scale: dim ⋈ updates on the business key (updates are
usually dimension-scale -> broadcast), everything else is narrow; no
window, no shuffle beyond the join. Deterministic: change detection is
exact column equality (null-safe), so reruns with the same inputs produce
identical tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    effective_date,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Type-2 merge: returns the new dimension table.

    - ``dim``: current table with ``key_col``, ``attr_cols``,
      ``valid_from_col``, ``valid_to_col`` (null = open row).
    - ``updates``: one row per business key with the new ``attr_cols``.
    - Open rows whose attributes CHANGED are closed (valid_to =
      ``effective_date``) and a new open row starts that date.
    - Unchanged open rows, already-closed rows, and un-updated keys pass
      through untouched. Updates for unseen keys insert as new open rows.

    Null-safe equality (``eqNullSafe``) decides "changed", so a NULL ->
    value transition versions correctly.
    """
    eff = F.lit(effective_date).cast("date")
    open_rows = dim.filter(F.col(valid_to_col).isNull())
    closed_rows = dim.filter(F.col(valid_to_col).isNotNull())

    u = updates.select(
        F.col(key_col).alias("__k"),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
    )
    j = open_rows.join(F.broadcast(u), F.col(key_col) == F.col("__k"), "full")

    same = None
    for c in attr_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        same = eq if same is None else (same & eq)

    matched = j.filter(F.col(key_col).isNotNull() & F.col("__k").isNotNull())
    unchanged_open = matched.filter(same).select(dim.columns)
    changed = matched.filter(~same)
    closed_now = changed.select(dim.columns).withColumn(valid_to_col, eff).select(
        dim.columns
    )
    opened_now = changed.select(
        F.col(key_col),
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        eff.alias(valid_from_col),
        F.lit(None).cast(dim.schema[valid_to_col].dataType).alias(valid_to_col),
    ).select(dim.columns)

    untouched_open = j.filter(F.col("__k").isNull()).select(dim.columns)
    inserted = j.filter(F.col(key_col).isNull()).select(
        F.col("__k").alias(key_col),
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        eff.alias(valid_from_col),
        F.lit(None).cast(dim.schema[valid_to_col].dataType).alias(valid_to_col),
    ).select(dim.columns)

    return (
        closed_rows.select(dim.columns)
        .unionByName(unchanged_open)
        .unionByName(closed_now)
        .unionByName(opened_now)
        .unionByName(untouched_open)
        .unionByName(inserted)
    )
