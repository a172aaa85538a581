"""Property-based tests for round-4 operators vs pure-Python references
over generated inputs. The load-bearing one: prefix-filtered containment
must be COMPLETE — every pair at/above the threshold that a brute-force
O(n²) scan finds must survive the candidate pruning."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

_SETTINGS = settings(max_examples=15, deadline=None)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

DOC = st.lists(
    st.sampled_from(WORDS), min_size=3, max_size=12
).map(lambda ws: " ".join(ws))


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute_containment(docs: dict[int, str], t_e4: int = 8000):
    out = set()
    ids = sorted(docs)
    sh = {i: _shingles(docs[i]) for i in ids}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            ia, ib = ids[a], ids[b]
            A, B = sh[ia], sh[ib]
            if not A or not B:
                continue
            common = len(A & B)
            ca = common * 10000 // len(A)
            cb = common * 10000 // len(B)
            if ca >= t_e4 or cb >= t_e4:
                out.add((ia, ib, common, len(A), len(B), ca, cb))
    return out


@given(st.lists(DOC, min_size=2, max_size=10))
@_SETTINGS
def test_containment_prefix_filter_is_complete(spark, docs):
    from bioeco_portal_etl_spark.text.dedupe import containment_pairs

    frame = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (
            r["id_a"],
            r["id_b"],
            r["n_common"],
            r["n_a"],
            r["n_b"],
            r["cont_a_e4"],
            r["cont_b_e4"],
        )
        for r in containment_pairs(frame, "doc_id", "text", threshold=0.8).collect()
    }
    want = _brute_containment(dict(enumerate(docs)))
    # completeness AND exactness: the pruned plan finds exactly the
    # brute-force answer (prefix filtering only removes non-candidates)
    assert got == want


@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_ewma_matches_python_reference(spark, values):
    import datetime as dt

    from bioeco_portal_etl_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=i), i, v / 100.0)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, eid long, v double")
    got = {
        r["event_id"]: r["ewma_e4"]
        for r in ewma(df, "u", "ts", "eid", "v").collect()
    }
    # pure-Python replay of the integer recurrence
    s = None
    want = {}
    for i, v in enumerate(values):
        v_e4 = math.floor((v / 100.0) * 10000)
        s = v_e4 if s is None else s + (v_e4 - s) // 4
        want[i] = s
    assert got == want
