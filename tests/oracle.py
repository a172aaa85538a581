"""Local replica of the driver's DuckDB-oracle comparison: row count, sorted
column names, and an order-insensitive value hash over stringified cells."""

from __future__ import annotations

import math


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
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
