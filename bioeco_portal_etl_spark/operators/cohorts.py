"""Cohort retention analysis: bucket users by first-seen period, then for
each (cohort, periods-since-acquisition) cell count how many of the cohort
were active — the classic retention triangle.

Plan: two aggregates co-partitioned on the SAME key. Pass 1 reduces the
event stream to per-user ``(first_week, distinct active weeks)`` in one
``groupBy(user)``; the week index is computed in the scan stage so only
``(user, week)`` longs cross the wire. Pass 2 explodes the per-user week
set (bounded by the analysis horizon, not the event count) and aggregates
the triangle — cohort cardinality reuses the same pass via ``offset = 0``
rather than a second scan of the raw events. At 100 TB the heavy shuffle
is pass 1 only, and it is a map-side-combinable ``min`` + ``collect_set``
over ints.

Determinism: week arithmetic is integer (datediff // 7 on non-negative
spans); retention_e4 = floor(active * 1e4 / cohort_size) as DOUBLE
division then floor — identical floor-division spelling on both engines
per the PORTABILITY contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    origin: str,
    period_days: int = 7,
) -> DataFrame:
    """Retention triangle: (cohort_week, week_offset, n_active, cohort_size,
    retention_e4), one row per observed (cohort, offset) cell.

    ``origin`` is the period-0 date (ISO string); periods are
    ``datediff(day, origin) // period_days`` — callers choose weekly /
    monthly by ``period_days``."""
    week = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit(origin)))
        / period_days
    ).cast("long")
    per_user = df.select(F.col(user_col).alias("u"), week.alias("w")).groupBy(
        "u"
    ).agg(
        F.min("w").alias("cohort_week"),
        F.collect_set("w").alias("weeks"),
    )
    cells = per_user.select(
        "cohort_week",
        F.explode("weeks").alias("__w"),
        "u",
    ).select(
        "cohort_week",
        (F.col("__w") - F.col("cohort_week")).alias("week_offset"),
        "u",
    )
    tri = cells.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("u").alias("n_active")
    )
    sizes = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return tri.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.floor(
            F.col("n_active").cast("double") * 10000.0
            / F.col("cohort_size").cast("double")
        )
        .cast("long")
        .alias("retention_e4"),
    )
