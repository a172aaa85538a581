"""Gap-based sessionization — the batch face of session windowing: split
each user's event stream into sessions wherever the gap to the previous
event exceeds a timeout, then summarize each session.

Complements streaming/windows.session_windows (the streaming face uses
Spark's built-in session_window; this operator materializes explicit
per-session rows with ordinal session ids over historical data, which the
built-in does not expose).

Scale shape — ONE exchange end-to-end:
  1. window over (user, ts) marks gap starts (lag) and running-sums them
     into a per-user session ordinal — the single hash(user) shuffle;
  2. the per-session rollup groups by (user, session_seq); its required
     distribution hash(user, session_seq)'s superset key hash(user) is
     already the frame's partitioning, so Catalyst plans NO second
     exchange (same property the IVF-PQ index build and g7's track agg
     rely on; pinned in tests/test_fuzzy_mix_sessions.py::
     test_session_stats_single_exchange).

Timestamps may arrive as TIMESTAMP or TIMESTAMP_NTZ (the driver's events
parquet is NTZ): epoch math normalizes via cast to timestamp_ltz first —
the session timezone is UTC, so NTZ wall-clock == LTZ instant, matching
DuckDB's epoch_us on a naive timestamp.
Session stats avoid double sums (floats would reassociate across engines):
counts, integer epoch-µs durations, and min/max only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-event session assignment: adds ``session_seq`` (1-based ordinal
    of the session within the user) under a total (ts, tiebreak) order."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    prev_us = F.lag(ts_us).over(w)
    is_new = (
        prev_us.isNull() | (ts_us - prev_us > gap_seconds * 1_000_000)
    ).cast("long")
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Session summaries: (user, session_seq, start, end, duration_sec,
    n_events). Duration is integer µs→s division — engine-exact."""
    s = sessionize(df, user_col, ts_col, tiebreak_col, gap_seconds)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            user_col,
            "session_seq",
            "session_start",
            "session_end",
            F.expr(
                "(unix_micros(cast(session_end as timestamp_ltz))"
                " - unix_micros(cast(session_start as timestamp_ltz)))"
                " div 1000000"
            ).alias("duration_sec"),
            "n_events",
        )
    )
