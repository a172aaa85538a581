"""The round-4 driver gate went red on 3 oracles whose DuckDB SQL surfaced
HUGEINT (unguarded ``sum(BIGINT)`` / ``list_sum`` / int-division-of-sum):
the driver's hash normalization stringifies HUGEINT/DECIMAL differently than
a plain ``fetchall``, so the local harness was green while the driver was
red.  These tests pin the machine-enforcement added in round 5: the local
harness must *flag* oracle type drift, not forgive it."""

import decimal

import duckdb
import pytest

from tests.oracle import (
    NON_PORTABLE_TYPES,
    OraclePortabilityError,
    _norm_cell,
    assert_portable_types,
    duck_signature,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t AS SELECT * FROM range(5) r(i)")
    return c


def test_lint_fails_on_sum_bigint(con):
    # DuckDB promotes sum(BIGINT) -> HUGEINT: the exact round-4 failure shape.
    with pytest.raises(OraclePortabilityError, match="HUGEINT"):
        assert_portable_types(con, "SELECT sum(i) AS s FROM t", name="inj")


def test_lint_fails_on_list_sum(con):
    with pytest.raises(OraclePortabilityError):
        assert_portable_types(
            con, "SELECT list_sum([i, i]) AS s FROM t", name="inj"
        )


def test_lint_fails_on_decimal_surface(con):
    with pytest.raises(OraclePortabilityError, match="DECIMAL"):
        assert_portable_types(
            con, "SELECT CAST(i AS DECIMAL(18,2)) AS d FROM t", name="inj"
        )


def test_lint_passes_on_cast_bigint(con):
    assert_portable_types(
        con, "SELECT CAST(sum(i) AS BIGINT) AS s FROM t", name="ok"
    )
    # count(*) is BIGINT, avg is DOUBLE — both portable.
    assert_portable_types(
        con, "SELECT count(*) AS c, avg(i) AS a FROM t", name="ok"
    )


def test_duck_signature_enforces_lint(con):
    with pytest.raises(OraclePortabilityError):
        duck_signature(con, "SELECT sum(i) AS s FROM t")


def test_norm_cell_raises_on_decimal():
    with pytest.raises(OraclePortabilityError):
        _norm_cell(decimal.Decimal("1.50"))


def test_norm_cell_raises_on_out_of_int64():
    with pytest.raises(OraclePortabilityError):
        _norm_cell(2**63)  # HUGEINT-shaped
    with pytest.raises(OraclePortabilityError):
        _norm_cell(-(2**63) - 1)


def test_norm_cell_accepts_int64_bounds():
    assert _norm_cell(2**63 - 1) == str(2**63 - 1)
    assert _norm_cell(-(2**63)) == str(-(2**63))


def test_non_portable_type_list_is_closed():
    assert NON_PORTABLE_TYPES == ("HUGEINT", "UHUGEINT", "DECIMAL")


# --- zero-row (vacuous) oracle lint — round-6, the tx31 postmortem -------


def test_vacuous_lint_fails_on_zero_vs_zero():
    from tests.oracle import VacuousOracleError, assert_nonvacuous

    with pytest.raises(VacuousOracleError, match="vacuous"):
        assert_nonvacuous(0, 0, name="tx31_doc_cosine")


def test_vacuous_lint_passes_on_nonzero():
    from tests.oracle import assert_nonvacuous

    assert_nonvacuous(392, 392, name="ok")
    # A genuine 0-vs-N mismatch is NOT the lint's job — the hash/row
    # comparison already fails it; the lint must stay silent.
    assert_nonvacuous(0, 392, name="mismatch-not-vacuous")
    assert_nonvacuous(392, 0, name="mismatch-not-vacuous")


# --- gate-quality audit shapes (scripts/gate_quality_audit.py) -----------


def test_gate_quality_audit_shapes():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.gate_quality_audit import audit_result

    assert audit_result(["a"], []) == ["EMPTY"]
    assert audit_result(["a", "b"], [(1, 1), (1, 1)]) == ["CONSTANT"]
    assert audit_result(["a"], [(None,)]) == ["ALL-NULL"]
    assert audit_result(["a", "b"], [(None, None), (None, None)]) == [
        "ALL-NULL"
    ]
    # one-row summary with a real value is FINE (the A/B-test shape)
    assert audit_result(["n", "z"], [(100, None)]) == []
    # two rows, one varying column is fine even if others are constant
    assert audit_result(["k", "v"], [(1, 7), (2, 7)]) == []
