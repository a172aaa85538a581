"""Property-based tests for the round-5 third-batch operators vs
pure-Python references: the BPE greedy-merge fold vs a reference greedy
rewriter (plus its algebraic invariants), the Morton interleave roundtrip,
and Benford digit extraction vs string slicing of the true integer part."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

_SETTINGS = settings(max_examples=12, deadline=None)

# ---------------------------------------------------------------------------
# BPE greedy merge: Spark fold vs pure-Python greedy reference
# ---------------------------------------------------------------------------

WORDS = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=10),
    min_size=1,
    max_size=8,
    unique=True,
)
PAIR = st.tuples(
    st.sampled_from(["a", "b", "ab", "ba"]), st.sampled_from(["a", "b"])
)


def _greedy_merge(symbols: list[str], ml: str, mr: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == ml
            and symbols[i + 1] == mr
        ):
            out.append(ml + mr)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@_SETTINGS
@given(WORDS, PAIR)
def test_bpe_fold_matches_reference_greedy(spark, words, pair):
    from bioeco_portal_etl_spark.text.bpe import apply_merge, with_spaced

    ml, mr = pair
    wf = with_spaced(
        spark.createDataFrame([(w, 1) for w in words], "w string, cnt long")
    )
    merge = spark.createDataFrame(
        [(f"{ml} {mr}", ml, mr)], "mp string, ml string, mr string"
    )
    got = {
        r["w"]: r["spaced"].split(" ")
        for r in apply_merge(wf, merge).select("w", "spaced").collect()
    }
    for w in words:
        expected = _greedy_merge(list(w), ml, mr)
        assert got[w] == expected, (w, ml, mr)
        # algebraic invariants: concatenation preserved, no eligible
        # adjacency survives a greedy pass
        assert "".join(got[w]) == w
        assert not any(
            got[w][i] == ml and got[w][i + 1] == mr
            for i in range(len(got[w]) - 1)
        )


# ---------------------------------------------------------------------------
# Morton interleave: python-reference roundtrip on the DuckDB dialect
# (the Spark dialect is covered by the x24 gate entry hashing equal)
# ---------------------------------------------------------------------------


def _z_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


@_SETTINGS
@given(
    st.integers(0, 2**16 - 1),
    st.integers(0, 2**16 - 1),
    st.sampled_from([4, 8, 16]),
)
def test_z_interleave_both_dialects_match_reference(a, b, bits):
    import duckdb

    from bioeco_portal_etl_spark.operators.zorder import z_expr_sql

    want = _z_ref(a % (1 << bits), b % (1 << bits), bits)
    con = duckdb.connect()
    expr = z_expr_sql(str(a % (1 << bits)), str(b % (1 << bits)), bits, "duck")
    assert con.execute(f"SELECT {expr}").fetchone()[0] == want


@_SETTINGS
@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_z_interleave_preserves_tile_locality(a, b):
    """Same 16x16 tile (top-4-bits of each 8-bit code equal) iff same
    top-8 z bits — the property file pruning relies on."""
    from bioeco_portal_etl_spark.operators.zorder import z_expr_sql

    import duckdb

    a, b = a % 256, b % 256
    con = duckdb.connect()
    z = con.execute(
        f"SELECT {z_expr_sql(str(a), str(b), 8, 'duck')}"
    ).fetchone()[0]
    assert (z >> 8) == _z_ref(a >> 4, b >> 4, 4)


# ---------------------------------------------------------------------------
# Benford digit extraction == leading digit of the integer part
# ---------------------------------------------------------------------------


@_SETTINGS
@given(
    st.floats(min_value=1.0, max_value=1e12, allow_nan=False).map(
        lambda x: round(x, 4)
    )
)
def test_benford_digit_extraction(spark, v):
    import math

    from bioeco_portal_etl_spark.operators.benford import benford_audit

    df = spark.createDataFrame([(float(v),)], "v double")
    out = benford_audit(df, "v").collect()
    assert len(out) == 1
    assert out[0]["digit"] == int(str(math.floor(v))[0])
    assert out[0]["obs_e4"] == 10000
