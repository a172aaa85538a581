"""Property-based tests (hypothesis): Column implementations vs independent
pure-Python reference semantics over adversarial generated inputs
(SURVEY.md §5.2 — the R-specific edge semantics are the hard parts:
str_trunc ellipsis, recode passthrough, make.unique, year parsing)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from bioeco_portal_etl_spark.functions.dates import year_to_date
from bioeco_portal_etl_spark.functions.recode import recode
from bioeco_portal_etl_spark.functions.strings import norm_ws, str_trunc
from bioeco_portal_etl_spark.geo.shapefile import parse_wkt, to_wkt

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=60
)
_SETTINGS = settings(max_examples=25, deadline=None)


def _run_col(spark, values, col_fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r.out for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


@given(st.lists(TEXT, min_size=1, max_size=20))
@_SETTINGS
def test_str_trunc_matches_stringr(spark, values):
    got = _run_col(spark, values, lambda c: str_trunc(c, 20))
    for v, g in zip(values, got):
        exp = v if len(v) <= 20 else v[:17] + "..."
        assert g == exp


@given(st.lists(TEXT, min_size=1, max_size=20))
@_SETTINGS
def test_norm_ws_matches_gsub(spark, values):
    """Reference: R gsub('\\s+',' ',.) + trimws — ASCII whitespace class
    (Java/R PCRE default), NOT Python's unicode \\s (which adds U+0085 etc.)."""
    got = _run_col(spark, values, norm_ws)
    for v, g in zip(values, got):
        assert g == re.sub(r"[ \t\n\x0b\f\r]+", " ", v).strip(" ")


@given(
    st.lists(st.sampled_from(["a", "b", "c", "zz", ""]), min_size=1, max_size=20),
    st.dictionaries(st.sampled_from(["a", "b", "c"]), st.text(max_size=5), max_size=3),
)
@_SETTINGS
def test_recode_passthrough_semantics(spark, values, mapping):
    got = _run_col(spark, values, lambda c: recode(c, mapping))
    for v, g in zip(values, got):
        assert g == mapping.get(v, v)


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=1000, max_value=9999).map(str),
            st.sampled_from(["active", "current", "0", "NA", "", "  2012  ", "12.5"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_year_to_date_parse(spark, values):
    got = _run_col(spark, values, year_to_date)
    for v, g in zip(values, got):
        m = re.fullmatch(r"(\d{4})(?:\.0)?", v.strip())
        if m:
            assert str(g) == f"{m.group(1)}-01-01"
        else:
            assert g is None


_COORD = st.integers(min_value=-179, max_value=179)
_POINTS = st.lists(st.tuples(_COORD, _COORD), min_size=2, max_size=6)


@given(_POINTS)
@_SETTINGS
def test_wkt_parse_format_roundtrip(points):
    wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in points) + ")"
    st_, parts = parse_wkt(wkt)
    assert to_wkt(st_, parts) == wkt
    mp = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in points) + ")"
    st2, parts2 = parse_wkt(mp)
    assert to_wkt(st2, parts2) == mp


@given(
    st.lists(
        st.sampled_from(["x", "y", "x_1", "x_2", "y_1", "zz"]),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_make_unique_properties(spark, keys):
    """Contract properties over adversarial suffix-colliding inputs:
    (1) output globally unique; (2) first occurrence of each key keeps its
    name; (3) keys unique in the input that no suffixing can collide with
    are unchanged."""
    from bioeco_portal_etl_spark.operators.dedupe import make_unique

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id int, key string"
    )
    out = {
        r.id: r.uk
        for r in make_unique(df, "key", [F.col("id").asc()], out_col="uk").collect()
    }
    vals = [out[i] for i in range(len(keys))]
    assert len(set(vals)) == len(vals)  # unique
    seen = set()
    for i, k in enumerate(keys):
        if k not in seen:
            assert vals[i] == k  # first occurrence keeps its name
            seen.add(k)
    if keys.count("zz") == 1:
        assert vals[keys.index("zz")] == "zz"


@given(
    st.lists(  # left events: (id, key, time-offset µs)
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=10,
    ),
    st.lists(  # right events: (key, time-offset µs, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)),
        min_size=0,
        max_size=10,
        unique_by=lambda t: (t[0], t[1]),  # asof contract: right unique per (key, ts)
    ),
)
@settings(max_examples=15, deadline=None)
def test_asof_join_matches_reference_model(spark, lefts, rights):
    """asof_join ≡ an obvious per-row python scan: latest right row with
    rts <= lts per key, over adversarial tiny instants (dense ties)."""
    from datetime import datetime, timedelta

    from bioeco_portal_etl_spark.operators.asof import asof_join

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + timedelta(microseconds=us)) for i, (k, us) in enumerate(lefts)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, base + timedelta(microseconds=us), v) for k, us, v in rights],
        "user_id long, ts timestamp, value long",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    }
    for i, (k, us) in enumerate(lefts):
        cands = [(rus, v) for rk, rus, v in rights if rk == k and rus <= us]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, us, cands)
