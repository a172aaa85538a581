"""Declarative data-quality constraint suite (the Deequ/Great-Expectations
pattern): a set of named checks over a table — completeness, uniqueness,
domain membership, range, pattern, freshness — evaluated in ONE aggregate
pass and emitted as a long-format (check, value) report.

Every check compiles to a Column aggregate, so N checks cost one scan
with a single map-side-combinable aggregate regardless of N — the
property that matters when the table is 100 TB and a naive
one-query-per-check harness would scan it N times. Values are BIGINT
(counts, epoch-days) so reports are engine-exact and diffable across
runs.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_CHECK_NAME = re.compile(r"^[A-Za-z0-9_]+$")


def completeness(col: str) -> Column:
    """Number of NULL values in ``col`` (0 = fully complete)."""
    return F.sum(F.col(col).isNull().cast("long"))


def uniqueness_gap(col: str) -> Column:
    """count(col) - count(DISTINCT col): 0 = unique (primary-key check)."""
    return F.count(col) - F.count_distinct(F.col(col))


def violations(pred: Column) -> Column:
    """Number of rows violating ``pred`` (rows where pred is FALSE/NULL)."""
    return F.sum((~F.coalesce(pred, F.lit(False))).cast("long"))


def profile_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate all ``checks`` (name -> BIGINT aggregate Column) in one
    pass; returns the long-format report (check, value) — one row per
    check, ordered by name for deterministic output.

    Check names are interpolated into a ``stack()`` SQL string, so they
    are restricted to ``[A-Za-z0-9_]+`` — a quote/backtick in a name
    would otherwise produce a parse error or a malformed report."""
    bad = [n for n in checks if not _CHECK_NAME.match(n)]
    if bad:
        raise ValueError(
            f"check names must match [A-Za-z0-9_]+, got: {bad!r}"
        )
    agg = df.agg(
        *[c.cast("long").alias(name) for name, c in checks.items()]
    )
    stack_args = ", ".join(f"'{n}', `{n}`" for n in checks)
    return (
        agg.select(
            F.expr(
                f"stack({len(checks)}, {stack_args}) AS (check, value)"
            )
        )
        .orderBy("check")
    )
