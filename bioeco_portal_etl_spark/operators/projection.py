"""Projection-layer operators (SURVEY.md §2.3 P1-P5, P20).

Reference parity:
  - select_rename -> notebooks/index.Rmd:57-63,74-97,138-160 (canonicalizing
    projections, e.g. 279 cols -> 25)
  - flag_columns  -> notebooks/index.Rmd:99,170-171 (regex-matched boolean
    conversion across EOV columns)
  - pair_null     -> notebooks/index.Rmd:282-283 (lon null iff lat null)
  - patch         -> notebooks/index.Rmd:127 (predicate-targeted cell update)

All pure Column expressions; Catalyst prunes the unselected source columns all
the way into the scan (ReadSchema), so a 279-column parquet pays for 25.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def select_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Project + rename in one step: ``{source_col: target_name}``."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def flag_columns(
    df: DataFrame,
    pattern: str,
    true_when: Column | None = None,
) -> DataFrame:
    """Convert every column matching ``pattern`` to boolean.

    Default rule (index.Rmd:99): non-null -> True, null -> False.
    EuroSea rule (index.Rmd:171): pass ``true_when=F.trim(F.col(c)) == "x"``
    via a callable — see ``flag_columns_eq``.
    """
    rx = re.compile(pattern)
    out = []
    for c in df.columns:
        if rx.search(c):
            out.append(F.col(c).isNotNull().alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)


def flag_columns_eq(df: DataFrame, pattern: str, literal: str = "x") -> DataFrame:
    """EuroSea variant: True iff trimmed value equals ``literal``."""
    rx = re.compile(pattern)
    out = []
    for c in df.columns:
        if rx.search(c):
            out.append(F.coalesce(F.trim(F.col(c)) == literal, F.lit(False)).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)


def pair_null(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Null each of the pair when the other is null (lat/lon integrity)."""
    a, b = F.col(col_a), F.col(col_b)
    return df.withColumn(col_a, F.when(b.isNull(), F.lit(None)).otherwise(a)).withColumn(
        col_b, F.when(a.isNull(), F.lit(None)).otherwise(b)
    )


def patch(df: DataFrame, target_col: str, predicate: Column, value) -> DataFrame:
    """Predicate-targeted column update — the reference's scalar cell patch
    generalized to a distributed conditional rewrite."""
    return df.withColumn(
        target_col, F.when(predicate, F.lit(value)).otherwise(F.col(target_col))
    )
