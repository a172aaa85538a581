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
    max_rounds: int = 8,
) -> DataFrame:
    """R make.unique: first occurrence keeps the name, later ones get
    ``{name}{sep}{k}`` with k = occurrence index - 1.

    Edge (SURVEY.md §2.6 A4 warning): suffixed candidates can collide with
    PRE-EXISTING names ("x","x","x_1" -> second "x" wants "x_1") and a
    single bump can land on a suffix a LATER occurrence already claimed
    ("x","x","x","x_1": bumping to x_2 collides with the third x). The only
    safe contract is a FIXPOINT: re-apply suffixing to whatever is still
    duplicated until nothing is. Output is guaranteed globally unique and
    deterministic under the explicit order; on multi-level collision chains
    the chosen suffix may differ from R's exact pick (R bumps k scanning
    its in-memory seen-set; we append another suffix level) — documented
    divergence, uniqueness preserved either way. Each round is one window
    over the (tiny) still-colliding subset; real data converges in 1-2.
    """
    out = out_col or col
    df = df.withColumn(out, F.col(col))
    for _ in range(max_rounds):
        w = Window.partitionBy(out).orderBy(*order_by)
        df = df.withColumn("__occ", F.row_number().over(w) - 1)
        if df.filter(F.col("__occ") > 0).limit(1).count() == 0:
            return df.drop("__occ")
        df = df.withColumn(
            out,
            F.when(
                F.col("__occ") > 0,
                F.concat(F.col(out), F.lit(sep), F.col("__occ").cast("string")),
            ).otherwise(F.col(out)),
        )
    # max_rounds exceeded: adversarial chain; results are still closer to
    # unique each round, but surface loudly rather than return silent dupes
    raise RuntimeError(f"make_unique did not converge in {max_rounds} rounds")
