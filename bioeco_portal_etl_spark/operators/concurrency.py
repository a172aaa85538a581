"""Interval concurrency via the +1/−1 sweep: the maximum number of
simultaneously-open intervals per group, and when the peak first
occurs. The capacity-planning primitive (peak concurrent sessions,
max parallel jobs, overlapping reservations) that naive self-joins
solve in O(n²) — the sweep is two rows per interval and ONE running-sum
window per group.

Half-open [start, end) semantics: an interval ending at t does not
overlap one starting at t, so end events sort BEFORE start events at
the same instant (delta ascending). All arithmetic in integer epoch
microseconds — engine-exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def max_concurrency(
    df: DataFrame,
    group_col: str,
    start_us_col: str,
    end_us_col: str,
    id_col: str,
) -> DataFrame:
    """(grp, n_intervals, max_concurrent, peak_at_us): peak running
    overlap per group and the earliest microsecond it is reached.
    ``id_col`` makes the sweep order total (deterministic running sums
    even for identical endpoints)."""
    starts = df.select(
        F.col(group_col).alias("grp"),
        F.col(start_us_col).alias("t"),
        F.lit(1).alias("delta"),
        F.col(id_col).alias("__tid"),
    )
    ends = df.select(
        F.col(group_col).alias("grp"),
        F.col(end_us_col).alias("t"),
        F.lit(-1).alias("delta"),
        F.col(id_col).alias("__tid"),
    )
    pts = starts.unionByName(ends)
    w = (
        Window.partitionBy("grp")
        .orderBy("t", "delta", "__tid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("running", F.sum("delta").over(w))
    per_grp = run.groupBy("grp").agg(
        F.max("running").cast("long").alias("max_concurrent")
    )
    peaks = (
        run.join(per_grp, "grp")
        .filter(F.col("running") == F.col("max_concurrent"))
        .groupBy("grp")
        .agg(F.min("t").cast("long").alias("peak_at_us"))
    )
    n = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    return (
        n.join(per_grp, "grp")
        .join(peaks, "grp")
        .select("grp", "n_intervals", "max_concurrent", "peak_at_us")
    )


def duck_max_concurrency(source_sql: str) -> str:
    """DuckDB CTE body mirroring :func:`max_concurrency`; exposes
    ``conc(grp, n_intervals, max_concurrent, peak_at_us)``.
    ``source_sql`` must project (grp, start_us, end_us, tid)."""
    return f"""__mc_src AS ({source_sql}),
__mc_pts AS (
  SELECT grp, start_us AS t, 1 AS delta, tid FROM __mc_src
  UNION ALL
  SELECT grp, end_us AS t, -1 AS delta, tid FROM __mc_src
),
__mc_run AS (
  SELECT grp, t,
         sum(delta) OVER (PARTITION BY grp ORDER BY t, delta, tid
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS running
  FROM __mc_pts
),
__mc_max AS (
  SELECT grp, max(running)::BIGINT AS max_concurrent
  FROM __mc_run GROUP BY grp
),
__mc_peak AS (
  SELECT r.grp, min(r.t)::BIGINT AS peak_at_us
  FROM __mc_run r JOIN __mc_max m
    ON m.grp = r.grp AND r.running = m.max_concurrent
  GROUP BY r.grp
),
conc AS (
  SELECT s.grp, count(*)::BIGINT AS n_intervals,
         m.max_concurrent, p.peak_at_us
  FROM __mc_src s
  JOIN __mc_max m ON m.grp = s.grp
  JOIN __mc_peak p ON p.grp = s.grp
  GROUP BY s.grp, m.max_concurrent, p.peak_at_us
)"""
