"""The correctness gate, locally: every catalog query vs its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from bioeco_portal_etl_spark import catalog
from tests.conftest import SF_SMOKE
from tests.oracle import assert_nonvacuous, compare, spark_signature

QUERIES = catalog.queries()
ORACLES = catalog.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        n, cols, _ = spark_signature(df)
        assert n > 0 and cols, f"{name}: weaker rows-only check failed"
        return
    result = compare(df, duck, ORACLES[name])
    assert result["cols_match"], f"{name}: column mismatch {result}"
    assert result["rows_match"], f"{name}: row-count mismatch {result}"
    assert result["hash_match"], f"{name}: value-hash mismatch {result}"
    # A 0-vs-0 comparison is a hash MATCH that verifies nothing — six
    # entries sat vacuously green at one SF from round 2 until the round-8
    # off-gate sweeps (PORTABILITY.md "Scale-dependence of gate
    # parameters"). This makes a parameter edit that collapses a cut fail
    # HERE, at the SF where it collapses, not just in validate.py.
    assert_nonvacuous(
        result["spark"]["rows"], result["duck"]["rows"], name=name
    )
