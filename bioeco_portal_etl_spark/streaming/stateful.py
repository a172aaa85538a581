"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.11); these are the engine's
scale extensions for continuous ingest:

  - ``streaming_dedupe``: exact first-seen dedupe across micro-batches —
    the streaming face of text/dedupe.exact_dedupe. State = the set of
    content hashes already emitted for the group key; survives across
    triggers in the state store, evicted by timeout.
  - ``running_counts``: per-key running (count, sum) with explicit state —
    the minimal template for custom accumulating operators.

Design notes for scale: state is partitioned by the grouping key (same hash
shuffle as a batch groupBy), Arrow-batched per group; a processing-time
timeout bounds state growth (tune to the dedupe horizon). Output mode is
append/update — each batch emits only what it decided this trigger.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "bucket int, doc_id long, content_hash string"
DEDUP_STATE_SCHEMA = "seen array<string>"

COUNT_OUT_SCHEMA = "user_id long, n_events long, sum_value double"
COUNT_STATE_SCHEMA = "n long, s double"


def _make_dedupe_fn(state_ttl_ms: int | None):
    def _dedupe_fn(
        key, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry: evict — re-saving here would resurrect the state
            # forever and defeat the bound on growth.
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        out = []
        # iterate id-ascending WITHIN the batch: partition delivery order
        # is not stable, so "first seen" would otherwise attribute a hash
        # to a nondeterministic doc. Sorted iteration makes a single-batch
        # drain exactly reproduce batch keep-first dedupe (smallest id
        # wins); across batches, arrival order still wins — the streaming
        # contract.
        rows = sorted(
            (d, h)
            for pdf in batches
            for d, h in zip(pdf["doc_id"], pdf["content_hash"])
        )
        for doc_id, h in rows:
            if h not in seen:
                seen.add(h)
                out.append((key[0], doc_id, h))
        state.update((list(seen),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=["bucket", "doc_id", "content_hash"])

    return _dedupe_fn


def streaming_dedupe(
    hashed: DataFrame, bucket_col: str = "bucket", state_ttl_ms: int | None = None
) -> DataFrame:
    """First-seen exact dedupe over a stream of (bucket, doc_id,
    content_hash) rows. ``bucket`` partitions the state (hash-prefix of the
    content hash upstream keeps groups balanced); emits each hash once.

    ``state_ttl_ms`` bounds state growth for long-running deployments
    (ProcessingTimeTimeout eviction). Leave None for bounded replays —
    a registered timeout keeps the query alive past availableNow drains."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return hashed.groupBy(bucket_col).applyInPandasWithState(
        _make_dedupe_fn(state_ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def _count_fn(
    key, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame([(key[0], n, s)], columns=["user_id", "n_events", "sum_value"])


def running_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running totals with explicit state (update mode)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _count_fn,
        outputStructType=COUNT_OUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
