"""Local replica of the driver's DuckDB-oracle comparison: row count, sorted
column names, and an order-insensitive value hash over stringified cells.

Portability guard (round-5): the external driver's hash normalization
stringifies DuckDB HUGEINT/DECIMAL surfaces differently from a plain
``fetchall`` (Arrow/decimal fetch path), which made 3 round-4 oracles
driver-red while locally green. ``duck_signature`` therefore DESCRIBEs
every oracle and *raises* on non-portable output types, so the local
harness flags type drift instead of forgiving it (PORTABILITY.md rule,
now machine-enforced)."""

from __future__ import annotations

import decimal
import math

#: DuckDB output types whose cross-harness stringification is not stable.
NON_PORTABLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


class OraclePortabilityError(ValueError):
    """An oracle's output schema or a fetched cell is of a type the external
    driver may stringify differently than this harness (HUGEINT / DECIMAL /
    out-of-int64 integer)."""


def assert_portable_types(con, sql: str, *, name: str = "<oracle>") -> None:
    """DESCRIBE ``sql`` and raise if any output column is HUGEINT/UHUGEINT/
    DECIMAL — the builder must CAST those surfaces (``::BIGINT`` for integer
    sums, ``::DOUBLE`` for money) before the driver gate sees them."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    bad = [
        (cname, ctype)
        for cname, ctype, *_ in rows
        if any(t in str(ctype).upper() for t in NON_PORTABLE_TYPES)
    ]
    if bad:
        raise OraclePortabilityError(
            f"{name}: non-portable oracle output type(s) {bad}; cast integer "
            "sums ::BIGINT and money ::DOUBLE (see PORTABILITY.md)"
        )


class VacuousOracleError(ValueError):
    """An oracle-mode comparison where BOTH sides returned zero rows: the
    hash match is trivially true and certifies nothing about the operator
    (the round-5 tx31_doc_cosine postmortem — it sat green in the driver
    gate for a round while comparing 0 rows against 0 rows)."""


def assert_nonvacuous(
    spark_rows: int, duck_rows: int, *, name: str = "<oracle>"
) -> None:
    """Raise if a spark-vs-oracle comparison was 0-vs-0 rows; entries must
    be tuned so the validation SF yields a nonzero deterministic result
    set (mirrors the ``rn > 0`` rule rows-only entries already obey)."""
    if spark_rows == 0 and duck_rows == 0:
        raise VacuousOracleError(
            f"{name}: vacuous oracle comparison — 0 rows on both sides; "
            "retune the entry's thresholds so the validation SF emits rows"
        )


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        # Never silently format like an int/float: a Decimal cell means a
        # DECIMAL/HUGEINT oracle surface leaked through — surface it.
        raise OraclePortabilityError(
            f"Decimal cell {v!r} reached the hash normalizer; cast the "
            "oracle surface (::DOUBLE / ::BIGINT)"
        )
    if isinstance(v, int) and not (_INT64_MIN <= v <= _INT64_MAX):
        raise OraclePortabilityError(
            f"out-of-int64 integer cell {v!r} (HUGEINT-shaped); cast the "
            "oracle surface ::BIGINT"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def frame_signature(columns: list[str], rows: list[tuple]) -> tuple[int, list[str], int]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    row_strs = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), cols_sorted, hash("\x1e".join(row_strs))


def spark_signature(df) -> tuple[int, list[str], int]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return frame_signature(cols, rows)


def duck_signature(con, sql: str):
    assert_portable_types(con, sql)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return frame_signature(cols, rows)


def compare(spark_df, con, sql: str) -> dict:
    sn, sc, sh = spark_signature(spark_df)
    dn, dc, dh = duck_signature(con, sql)
    return {
        "rows_match": sn == dn,
        "cols_match": sc == dc,
        "hash_match": sh == dh,
        "spark": {"rows": sn, "cols": sc},
        "duck": {"rows": dn, "cols": dc},
    }
