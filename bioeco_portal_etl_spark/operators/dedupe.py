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
    """R make.unique, exactly (notebooks/index.Rmd:392-393): the first
    occurrence of each name keeps it; the i-th later occurrence (i >= 1,
    under the explicit order) becomes ``{name}{sep}{k}`` where k is the
    i-th smallest positive integer such that ``{name}{sep}{k}`` is not
    among the DISTINCT INPUT names. R hashes the whole input vector up
    front, so a pre-existing "x_1" blocks the synthesized suffix even when
    it appears later: make.unique(c("x","x","x_1")) -> x, x_2, x_1
    (SURVEY.md §2.6 A4 edge).

    Distributed shape — one pass, no fixpoint, no eager job:
      1. occurrence index per name: window keyed by name;
      2. "blocked" suffix integers per base name: parse the distinct names
         that look like ``base{sep}[1-9][0-9]*`` (a per-name-key groupBy —
         same shuffle key as the window) into tiny sorted arrays;
      3. k for occurrence i = left-fold over the blocked array
         (acc starts at i; each blocked b <= acc bumps acc by 1) — the
         i-th smallest non-blocked positive integer, all in whole-stage
         codegen.
    Synthesized names cannot collide with each other (base + sep + integer
    decomposes uniquely for a non-digit sep) and skip every input name, so
    the output is globally unique and R-identical. Null names pass through
    null (R propagates NA). Scale: both auxiliary frames hash on the same
    key as the main window; blocked arrays are bounded by the count of
    input names shaped like an existing base plus a suffix (tiny).
    """
    import re as _re

    out = out_col or col
    pat = f"^(.*){_re.escape(sep)}([1-9][0-9]*)$"
    df = df.withColumn(out, F.col(col))
    w = Window.partitionBy(out).orderBy(*order_by)
    df = df.withColumn("__occ", (F.row_number().over(w) - 1).cast("long"))
    blocked = (
        df.select(F.col(out).alias("__mu_name"))
        .distinct()
        .filter(F.col("__mu_name").rlike(pat))
        .select(
            F.regexp_extract("__mu_name", pat, 1).alias("__mu_base"),
            F.regexp_extract("__mu_name", pat, 2).cast("long").alias("__mu_j"),
        )
        .groupBy("__mu_base")
        .agg(F.array_sort(F.collect_set("__mu_j")).alias("__mu_blocked"))
    )
    df = df.join(blocked, F.col(out) == F.col("__mu_base"), "left").drop("__mu_base")
    k = F.aggregate(
        F.coalesce(F.col("__mu_blocked"), F.array().cast("array<long>")),
        F.col("__occ"),
        lambda acc, b: F.when(b <= acc, acc + F.lit(1).cast("long")).otherwise(acc),
    )
    return df.withColumn(
        out,
        F.when(
            F.col("__occ") > 0, F.concat(F.col(out), F.lit(sep), k.cast("string"))
        ).otherwise(F.col(out)),
    ).drop("__occ", "__mu_blocked")
