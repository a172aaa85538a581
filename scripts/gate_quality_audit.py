#!/usr/bin/env python
"""Gate-quality audit (VERDICT r5 "Next round" #5): a hash-green gate row
only certifies an operator if the compared result actually EXERCISES it.
The round-5 tx31 postmortem was the empty case (0 rows vs 0 rows); the
next failure shape is the near-vacuous one — a result where every column
is constant, so the hash pins one value instead of a distribution.

For every oracle-mode catalog entry this audits the DuckDB oracle result
at the validation SF (the oracle equals the Spark result whenever
validate.py is green, so auditing it audits the gate comparison) and
flags:

  EMPTY      — 0 rows (the tx31 shape; validate.py now hard-fails this)
  CONSTANT   — >= 2 rows but every column single-valued
  ALL-NULL   — 1 row and every cell NULL (an aggregate that computed
               nothing)
  LOW-SIGNAL — >= 2 rows and no column reaches 2 distinct NON-NULL
               values

Single-row reports with at least one non-NULL cell are fine (a one-row
summary like the A/B test is the operator's contract). Rows-only entries
(no oracle SQL) are skipped here — validate.py already enforces rn > 0
and their checks are pytest-side.

Usage: python scripts/gate_quality_audit.py [--sf-dir DIR] [--out FILE]
Exit 0 = no flags.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def audit_result(columns: list[str], rows: list[tuple]) -> list[str]:
    """Return the list of quality flags for one result set (empty = OK)."""
    if not rows:
        return ["EMPTY"]
    ncols = len(columns)
    distinct_nonnull = [set() for _ in range(ncols)]
    any_nonnull = [False] * ncols
    for r in rows:
        for i in range(ncols):
            v = r[i]
            if v is not None:
                any_nonnull[i] = True
                if len(distinct_nonnull[i]) < 2:
                    distinct_nonnull[i].add(str(v))
    flags = []
    if len(rows) == 1:
        if not any(any_nonnull):
            flags.append("ALL-NULL")
        return flags
    if not any(len(d) >= 2 for d in distinct_nonnull):
        # every column single-valued (or null) across >= 2 rows
        flags.append("CONSTANT" if any(any_nonnull) else "ALL-NULL")
    return flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    oracles = mod.oracle_sql()
    report: dict[str, dict] = {}
    flagged = []
    for name, sql in sorted(oracles.items()):
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        flags = audit_result(cols, rows)
        # per-column distinct counts for the report (bounded fetch: the
        # validation SF keeps results small)
        report[name] = {
            "rows": len(rows),
            "cols": len(cols),
            "flags": flags,
        }
        if flags:
            flagged.append(name)
            print(f"{name}: {flags} rows={len(rows)}")
    n_rows_only = len(mod.queries()) - len(oracles)
    summary = {
        "n_audited": len(oracles),
        "n_rows_only_skipped": n_rows_only,
        "flagged": flagged,
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "entries": report}, f, indent=1)
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
