"""Round-8 adversarial property tests (VERDICT r7 #6): extend the
micro-batch re-slicing treatment from sessionization to the streaming
LOCF operator.

1. LOCF segmentation is invariant under micro-batch RE-SLICING: any
   consecutive slicing of a per-user time-ordered observation stream —
   with arbitrary re-ordering WITHIN each batch (the function body
   sorts) — yields byte-identical closed segments AND the same open-tail
   state as the single-batch run and as a pure-Python lead() reference.
   This is w21's documented contract (streaming/locf.py): at any drain
   point the output equals the batch lead()-segments minus each user's
   open segment.

2. The non-decreasing-arrival precondition now FAILS LOUDLY (ADVICE r7):
   any slicing that delivers a later batch containing an observation
   strictly earlier than the held state raises ValueError instead of
   emitting a negative-duration segment. Property: for every generated
   stream with >= 2 distinct timestamps, swapping the batch order of a
   valid 2-slice split trips the guard.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from bioeco_portal_etl_spark.streaming.locf import _locf_fn

_SETTINGS = settings(max_examples=80, deadline=None)


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


def _drive(batches: list[list[tuple[int, int, int]]]):
    """Feed [(ts_us, event_id, vq)] batches through the state fn body;
    return (closed segments, final open-tail state)."""
    state = _FakeGroupState()
    out = []
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "user_id": [7] * len(batch),
                "ts": pd.to_datetime([t for t, _, _ in batch], unit="us"),
                "event_id": [e for _, e, _ in batch],
                "vq": [v for _, _, v in batch],
            }
        )
        for o in _locf_fn((7,), iter([pdf]), state):
            out.extend(
                (r.user_id, r.start_us, r.dur_us, r.vq)
                for r in o.itertuples(index=False)
            )
    return out, state._v


def _ref_segments(events: list[tuple[int, int, int]]):
    """Pure-Python lead() reference: one closed segment per consecutive
    pair of the (ts, event_id)-sorted stream; the last observation is
    the open tail."""
    s = sorted(events)
    segs = [
        (7, s[i][0], s[i + 1][0] - s[i][0], s[i][2])
        for i in range(len(s) - 1)
    ]
    return segs, (s[-1][0], s[-1][2])


@st.composite
def _stream_and_cuts(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ts = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    vqs = draw(st.lists(st.integers(-1000, 1000), min_size=n, max_size=n))
    events = [(t, i, v) for i, (t, v) in enumerate(zip(sorted(ts), vqs))]
    ncuts = draw(st.integers(min_value=0, max_value=min(5, n - 1)))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=n - 1),
                min_size=ncuts, max_size=ncuts, unique=True,
            )
        )
    ) if n > 1 else []
    seed = draw(st.randoms(use_true_random=False))
    return events, cuts, seed


@_SETTINGS
@given(_stream_and_cuts())
def test_locf_invariant_under_batch_reslicing(case):
    events, cuts, rng = case
    whole, st_whole = _drive([events])
    bounds = [0, *cuts, len(events)]
    batches = []
    for lo, hi in zip(bounds, bounds[1:]):
        batch = list(events[lo:hi])
        rng.shuffle(batch)  # intra-batch disorder: the body sorts
        batches.append(batch)
    sliced, st_sliced = _drive(batches)
    ref, st_ref = _ref_segments(events)
    assert whole == sliced == ref
    assert st_whole == st_sliced == st_ref
    # every closed segment has strictly positive duration
    assert all(d > 0 for _, _, d, _ in ref)


@_SETTINGS
@given(_stream_and_cuts())
def test_locf_out_of_order_replay_fails_loudly(case):
    events, _cuts, _rng = case
    if len(events) < 2:
        return
    mid = len(events) // 2
    # deliver the LATER half first: the held state then sees an earlier ts
    with pytest.raises(ValueError, match="out-of-order cross-batch"):
        _drive([events[mid:], events[:mid]])
