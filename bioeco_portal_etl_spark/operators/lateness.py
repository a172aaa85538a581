"""Watermark lateness accounting — the batch-face audit of the exact
policy Structured Streaming applies with ``withWatermark(ts, delay)``:
an event is ON TIME if its event time is >= the stream's high-water mark
at arrival, LATE-ACCEPTED if it trails the mark by <= the allowed delay,
and DROPPED if it trails further (streaming would silently discard it).

Running this classification over a replayable log answers the question
every watermark deployment needs answered BEFORE picking the delay: how
much data would a 5-minute watermark actually drop, per key/type? (The
repo's live streaming entries — streaming/ w1-w12 — enforce the policy;
this operator measures it.)

Semantics pinned for engine exactness: the "arrival order" is an explicit
monotone column (event_id in the synthetic log — a kafka offset in
production), the high-water mark is the running max of PRIOR arrivals
within the key (rowsBetween(unboundedPreceding, -1) — excluding self, so
the first arrival is on-time by definition), and the delay comparison is
timestamp - INTERVAL arithmetic (microsecond-exact integers in both
engines).

Plan: one window over the (key, arrival) exchange + one combinable
groupBy — the watermark state is per-key and single-pass, exactly the
memory shape the streaming engine itself keeps. The per-key mark mirrors
Spark's per-partition watermark before the global min; a global-mark
audit is the same query with a constant key."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def lateness_audit(
    df: DataFrame,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    delay_sec: int,
    group_col: str | None = None,
) -> DataFrame:
    """(group, status, n) counts with status in ontime/late/dropped.

    ``group_col`` picks the report dimension (defaults to ``key_col`` —
    the watermark partitioning key)."""
    g = group_col or key_col
    w = (
        Window.partitionBy(key_col)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mark = F.max(ts_col).over(w)
    ts = F.col(ts_col)
    status = (
        F.when(mark.isNull() | (ts >= mark), F.lit("ontime"))
        .when(
            ts >= mark - F.expr(f"INTERVAL {int(delay_sec)} SECOND"),
            F.lit("late"),
        )
        .otherwise(F.lit("dropped"))
    )
    return (
        df.select(F.col(g).alias("grp"), status.alias("status"))
        .groupBy("grp", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def duck_lateness_cte(
    from_table: str,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    delay_sec: int,
    group_col: str | None = None,
) -> str:
    """DuckDB mirror; exposes ``lat(grp, status, n)``."""
    g = group_col or key_col
    return f"""
marked AS (
  SELECT {g} AS grp, {ts_col} AS ts,
         max({ts_col}) OVER (PARTITION BY {key_col} ORDER BY {arrival_col}
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS mark
  FROM {from_table}
),
lat AS (
  SELECT grp,
         CASE WHEN mark IS NULL OR ts >= mark THEN 'ontime'
              WHEN ts >= mark - INTERVAL {int(delay_sec)} SECOND THEN 'late'
              ELSE 'dropped' END AS status,
         count(*)::BIGINT AS n
  FROM marked GROUP BY 1, 2
)"""
