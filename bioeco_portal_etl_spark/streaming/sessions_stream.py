"""Streaming gap-sessionization — the applyInPandasWithState face of
operators/sessions.py (which is the batch face; streaming/windows.py's
session_counts is the built-in session_window face; this one exists
because the built-in cannot emit explicit per-session rows with custom
state semantics).

Protocol per (user) group and micro-batch:
  1. the batch's events are sorted by (ts, tiebreak) inside the group —
     out-of-order WITHIN a batch is always handled exactly;
  2. the open session carried in state is extended or closed against the
     sorted events; every CLOSED session is emitted (append mode);
  3. the still-open tail session stays in state for the next batch.

Exactness contract ACROSS batches: arrivals must be non-decreasing in
event time per user at batch granularity (the standard log-ingest layout —
time-partitioned files replayed in order). An event older than the open
session's end would belong to an already-emitted session; bound that risk
with a watermark upstream and a state TTL here, same trade as
streaming_dedupe's.

State is one (start_us, end_us, n) triple per user — O(users), not
O(events); the state-store shuffle on user_id is the same single exchange
the batch operator pays.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESS_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "duration_sec long, n_events long"
)
SESS_STATE_SCHEMA = "start_us long, end_us long, n long"
_US = 1_000_000


def _make_sessionize_fn(gap_us: int, state_ttl_ms: int | None = None):
    def _fn(
        key, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry: the idle user's open session is evicted (dropped,
            # not emitted — documented contract). Re-saving state here would
            # resurrect it forever and defeat the growth bound.
            state.remove()
            return
        events: list[tuple[int, int]] = []
        for pdf in batches:
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            events.extend(zip(ts_us.tolist(), pdf["event_id"].tolist()))
        events.sort()
        if not events:
            return
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = n = None
        closed: list[tuple[int, int, int, int, int]] = []
        for t, _tie in events:
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us > gap_us:
                closed.append(
                    (key[0], start_us, end_us, (end_us - start_us) // _US, n)
                )
                start_us, end_us, n = t, t, 1
            else:
                # min/max, not assignment: a cross-batch LATE event (t within
                # or before the open session — possible only when the
                # non-decreasing-arrival contract is violated) is absorbed
                # into the open session instead of rewinding its end and
                # spuriously splitting it at the next on-time event. Under
                # ordered replay t >= end_us always, so this is byte-identical
                # to the batch face. Late events older than an already-EMITTED
                # session still attribute here (append mode can't retract) —
                # that bound is the upstream watermark + state TTL.
                start_us = min(start_us, t)
                end_us, n = max(end_us, t), n + 1
        state.update((start_us, end_us, n))
        if state_ttl_ms is not None:
            # must be re-registered after every state.update — update clears
            # the pending timeout (mirrors streaming_dedupe).
            state.setTimeoutDuration(state_ttl_ms)
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "duration_sec",
                    "n_events",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return _fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Closed sessions per user over a stream of (user_id, ts, event_id)
    rows. Each user's final (still-open) session remains in state and is
    never emitted — at any point the output is exactly the sessions that
    can no longer change. ``state_ttl_ms`` evicts idle users' open
    sessions for unbounded deployments (they are then dropped, not
    emitted — tune to the product's session-forever horizon)."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_fn(gap_seconds * _US, state_ttl_ms),
        outputStructType=SESS_OUT_SCHEMA,
        stateStructType=SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
