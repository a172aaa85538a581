"""Streaming rolling z-score anomaly detection — the streaming face of
operators/timeseries.rolling_zscore, completing the batch/streaming
duality set (sessionize w4/w5, dedupe td1/w6, now anomaly x13/w8).

applyInPandasWithState per user: state is the ring buffer of the last
``window_rows`` e2-quantized values — a fixed handful of longs per key,
the smallest possible stateful-operator state. Each trigger processes its
rows in (ts, event_id) order (partition delivery order is not stable;
sorted iteration makes a single-batch availableNow drain reproduce the
batch operator exactly — the same contract w5/w6 pin), scores each event
against the buffer of STRICTLY PRIOR events (self-excluding, like the
batch face), then appends it to the buffer.

Exactness: identical integer frame sums as the batch face; z surfaces as
``floor(z * 1e4)`` (the e4-floor convention — Python's round() half-even
vs Spark/DuckDB round() half-up would flip at boundaries, floor cannot).
The variance chain (n*s2 - s1*s1 exact ints, one division, one sqrt, one
division) is written in the same operation order as the oracle SQL.

``state_ttl_ms`` registers a ProcessingTimeTimeout that evicts idle-user
buffers (same growth bound as streaming_dedupe); None for bounded
replays.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ZS_OUT_SCHEMA = "user_id long, event_id long, value double, z_e4 long"
ZS_STATE_SCHEMA = "buf array<long>"


def _make_zscore_fn(
    window_rows: int, min_rows: int, threshold: float, state_ttl_ms: int | None
):
    # threshold compares in e4-floored space (NOT the raw double): the
    # emitted value is floor(z*1e4), so gating on raw z would include
    # z in (2.5, 2.50001) whose floored surface equals the boundary —
    # a row the oracle's |z_e4| > threshold_e4 filter excludes.
    threshold_e4 = math.floor(threshold * 10000)

    def fn(
        key, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        buf = list(state.get[0]) if state.exists else []
        rows = sorted(
            (int(t), int(e), float(v))
            for pdf in batches
            for t, e, v in zip(pdf["t"], pdf["event_id"], pdf["value"])
        )
        out = []
        for _t, e, v in rows:
            v_e2 = math.floor(v * 100)
            n = len(buf)
            if n >= min_rows:
                s1 = sum(buf)
                s2 = sum(x * x for x in buf)
                var = (n * s2 - s1 * s1) / (n * n)
                if var > 0:
                    z = (v_e2 - s1 / n) / math.sqrt(var)
                    z_e4 = math.floor(z * 10000)
                    if abs(z_e4) > threshold_e4:
                        out.append((key[0], e, v, z_e4))
            buf.append(v_e2)
            if len(buf) > window_rows:
                buf = buf[-window_rows:]
        state.update((buf,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "value", "z_e4"]
            )

    return fn


def streaming_zscore(
    events: DataFrame,
    window_rows: int = 10,
    min_rows: int = 5,
    threshold: float = 2.5,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Anomalies over a stream of (user_id, t epoch-µs, event_id, value):
    events > ``threshold`` sigma from their user's trailing
    ``window_rows`` values. Append mode; state = one small long array per
    user, TTL-evicted when ``state_ttl_ms`` is set."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_zscore_fn(window_rows, min_rows, threshold, state_ttl_ms),
        outputStructType=ZS_OUT_SCHEMA,
        stateStructType=ZS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def prepare_event_stream(stream: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Project a raw event stream to the operator's input contract
    (epoch-µs long ``t`` — same LTZ-cast convention as the batch face)."""
    return stream.select(
        "user_id",
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("t"),
        "event_id",
        "value",
    )
