"""Dedupe / duplicate-audit operators (SURVEY.md §2.6 A2-A4).

Reference parity:
  - dedupe_keep_first -> notebooks/index.Rmd:670 (distinct(username, .keep_all))
  - duplicate_audit   -> notebooks/index.Rmd:382 (duplicated() both directions)
  - make_unique       -> notebooks/index.Rmd:392-393 (make.unique(sep="_"))

Order-sensitivity: R's first-wins depends on frame order; here every operator
takes an explicit ``order_by`` tiebreak (SURVEY.md §4.1). All three are a
single hash-shuffle on the key (window partitionBy) — at 100 TB the key
partitioning is the natural one and AQE handles skewed keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dedupe_keep_first(
    df: DataFrame, key_cols: list[str], order_by: list[str | Column]
) -> DataFrame:
    """Keep the first row per key under the explicit total order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_audit(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """All members of any key-collision group (R's duplicated() | fromLast)."""
    w = Window.partitionBy(*key_cols)
    return (
        df.withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("__cnt") > 1)
        .drop("__cnt")
    )


def make_unique(
    df: DataFrame,
    col: str,
    order_by: list[str | Column],
    sep: str = "_",
    out_col: str | None = None,
) -> DataFrame:
    """R make.unique: first occurrence keeps the name, later ones get
    ``{name}{sep}{k}`` with k = occurrence index - 1.

    Edge (SURVEY.md §2.6 A4 warning): R also avoids colliding with
    PRE-EXISTING ``x_1``-style names by bumping k until free. We reproduce
    that with an anti-join pass: suffixed candidates that collide with an
    original name get their k shifted past the collision. One extra
    broadcast-able join of (collision names) — tiny in practice.
    """
    out = out_col or col
    w = Window.partitionBy(col).orderBy(*order_by)
    df = df.withColumn("__occ", F.row_number().over(w) - 1)
    candidate = F.when(
        F.col("__occ") > 0, F.concat(F.col(col), F.lit(sep), F.col("__occ").cast("string"))
    ).otherwise(F.col(col))
    df = df.withColumn("__cand", candidate)

    # collision-avoidance: if a candidate equals some *original* name of a
    # different row, keep bumping. One bump layer suffices for one collision
    # level (R iterates; multi-level chains are pathological — documented).
    originals = df.select(F.col(col).alias("__orig")).distinct()
    df = df.join(
        F.broadcast(originals),
        (F.col("__cand") == F.col("__orig")) & (F.col("__occ") > 0),
        "left",
    )
    bumped = F.when(
        F.col("__orig").isNotNull(),
        F.concat(F.col(col), F.lit(sep), (F.col("__occ") + 1).cast("string")),
    ).otherwise(F.col("__cand"))
    return df.withColumn(out, bumped).drop("__occ", "__cand", "__orig")
