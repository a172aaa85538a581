"""Streaming LOCF segmentation — the stateful face of the time-weighted
average (catalog rel38). Each observation's value HOLDS until the next
observation arrives (last observation carried forward); the stream emits
one row per CLOSED segment: (user_id, start_us, dur_us, vq). A TWA over
any horizon is then a plain windowed aggregation over the segments —
sum(vq*dur)/sum(dur) — so the expensive part (pairing consecutive
irregular observations across micro-batch boundaries) happens once,
in O(users) state.

Protocol per (user) group and micro-batch (the sessions_stream.py
contract): events are sorted by (ts, event_id) WITHIN the batch; the
open observation carried in state closes the first segment; each
consecutive pair closes one more; the batch's last observation replaces
the state. Cross-batch exactness requires per-user non-decreasing
arrival at batch granularity — the time-partitioned-replay layout —
bounded upstream by a watermark, same trade as streaming_sessionize.

At any drain point the output is exactly the batch lead()-segments
(rel38's ``seg`` frame) minus each user's OPEN segment — which is what
the oracle computes.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOCF_OUT_SCHEMA = "user_id long, start_us long, dur_us long, vq long"
LOCF_STATE_SCHEMA = "last_us long, last_vq long"


def _locf_fn(
    key, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    events: list[tuple[int, int, int]] = []
    for pdf in batches:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        events.extend(
            zip(ts_us.tolist(), pdf["event_id"].tolist(), pdf["vq"].tolist())
        )
    if not events:
        return
    events.sort()
    if state.exists:
        last_us, last_vq = state.get
    else:
        last_us = last_vq = None
    out: list[tuple[int, int, int, int]] = []
    for t, _tie, vq in events:
        if last_us is not None:
            if t < last_us:
                # The non-decreasing-arrival precondition (module
                # docstring) is violated: a later micro-batch delivered
                # this user's event BEHIND the held state. Emitting
                # would produce a negative-duration segment and silently
                # corrupt every downstream TWA — fail loudly so the
                # replay layout gets fixed instead.
                raise ValueError(
                    f"streaming_locf_segments: out-of-order cross-batch "
                    f"event for user {key[0]}: ts={t}us < held "
                    f"state {last_us}us — replay must be per-user "
                    f"non-decreasing at batch granularity"
                )
            out.append((key[0], last_us, t - last_us, last_vq))
        last_us, last_vq = t, vq
    state.update((last_us, last_vq))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "start_us", "dur_us", "vq"]
        )


def streaming_locf_segments(events: DataFrame) -> DataFrame:
    """Closed LOCF segments per user over a stream of
    (user_id, ts, event_id, vq) rows; each user's final observation
    stays open in state and is never emitted."""
    return events.groupBy("user_id").applyInPandasWithState(
        _locf_fn,
        outputStructType=LOCF_OUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
