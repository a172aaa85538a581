#!/usr/bin/env python
"""Changed-since-sampled re-gate check (VERDICT r7 "Next round" #5).

The driver gate hash-samples 50 catalog entries per round; an entry that
went green in round N and whose implementing code is edited in round N+k
would never be driver-re-checked unless rotation happens to pick it. The
gr23 floor-fix (edited after VALIDATE_r07 but before any driver sample)
showed the window. This script closes it:

For every catalog entry it computes
  * sampled_round   — most recent round with a green CORRECTNESS row
  * sampled_at      — commit timestamp of that round's CORRECTNESS file
  * changed_at      — most recent commit touching any implementing code:
      - the spark_fn's own source span, traced through history with
        `git log -L start,end:file` (span-level, so the per-round
        _GATE_FIRST churn in catalog.py does not flag every entry), and
      - every bioeco_* module the fn references (whole-file last commit;
        helper modules do not churn per round)
and flags the entry CHANGED_SINCE_SAMPLED when changed_at > sampled_at.

The rotation policy consumes this output: flagged entries rank right
after never-sampled ones when filling the 50 gate slots.

Limitations (documented, acceptable for a rotation heuristic): indirect
calls through data structures aren't traced; a flagged entry may be a
comment-only edit. Both err toward re-sampling, never toward skipping.

Usage: python scripts/regate_check.py [--out FILE]
Exit 0 always (informational); the window test consumes the JSON.
"""

from __future__ import annotations

import argparse
import glob
import inspect
import json
import subprocess
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout.strip()


def sampled_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0*.json"))):
        rnd = int(Path(f).stem.split("_r0")[1])
        for name, row in json.load(open(f)).items():
            # only a GREEN row counts as driver verification
            if row.get("rows_match") and row.get("hash_match", True):
                last[name] = max(last.get(name, 0), rnd)
    return last


def round_timestamps() -> dict[int, int]:
    ts: dict[int, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0*.json"))):
        rnd = int(Path(f).stem.split("_r0")[1])
        out = _git("log", "--diff-filter=A", "-1", "--format=%ct", "--", Path(f).name)
        if out:
            ts[rnd] = int(out)
    return ts


def implementing_files(fn) -> tuple[tuple[str, int, int] | None, set[str]]:
    """(defining file, span start, span end) + referenced package modules.

    Two traces, both err toward re-sampling:
      * __globals__ lookup of co_names — catches module-level imports;
      * a regex over the SOURCE TEXT for `bioeco_portal_etl_spark.x.y`
        dotted paths — catches function-LOCAL imports, which co_names
        cannot see (round-9 fix: tx29's lazy `from ...ngram_coverage
        import` made its round-8 rewrite invisible to this script)."""
    span = None
    src_text = ""
    try:
        lines, start = inspect.getsourcelines(fn)
        src_text = "".join(lines)
        f = inspect.getsourcefile(fn)
        if f:
            span = (str(Path(f).relative_to(REPO)), start, start + len(lines) - 1)
    except (OSError, TypeError, ValueError):
        pass
    mods: set[str] = set()
    g = getattr(fn, "__globals__", {})
    for name in getattr(fn, "__code__", None) and fn.__code__.co_names or ():
        obj = g.get(name)
        mod = None
        if isinstance(obj, types.ModuleType):
            mod = obj
        elif callable(obj):
            mod = sys.modules.get(getattr(obj, "__module__", ""), None)
        if mod and getattr(mod, "__name__", "").startswith("bioeco") and mod.__file__:
            p = Path(mod.__file__)
            if p.is_relative_to(REPO):
                mods.add(str(p.relative_to(REPO)))
    # function-local imports: resolve every dotted package path that
    # appears in the source text (import_module is a no-op cache hit for
    # anything the entry actually runs)
    import importlib
    import re

    for dotted in set(re.findall(r"bioeco_portal_etl_spark(?:\.\w+)+", src_text)):
        mod = sys.modules.get(dotted)
        if mod is None:
            try:
                mod = importlib.import_module(dotted)
            except ImportError:
                # `pkg.mod.attr` matches too — retry without the last part
                try:
                    mod = importlib.import_module(dotted.rsplit(".", 1)[0])
                except ImportError:
                    continue
        if getattr(mod, "__file__", None):
            p = Path(mod.__file__)
            if p.is_relative_to(REPO):
                mods.add(str(p.relative_to(REPO)))
    return span, mods


_SPAN_CACHE: dict[tuple[str, int, int], int] = {}
_FILE_CACHE: dict[str, int] = {}


def span_last_change(path: str, start: int, end: int) -> int:
    key = (path, start, end)
    if key not in _SPAN_CACHE:
        out = _git("log", "-1", "--format=%ct", "-L", f"{start},{end}:{path}",
                   "--no-patch")
        _SPAN_CACHE[key] = int(out.splitlines()[0]) if out else 0
    return _SPAN_CACHE[key]


def file_last_change(path: str) -> int:
    if path not in _FILE_CACHE:
        out = _git("log", "-1", "--format=%ct", "--", path)
        _FILE_CACHE[path] = int(out) if out else 0
    return _FILE_CACHE[path]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bioeco_portal_etl_spark import catalog

    last = sampled_rounds()
    ts = round_timestamps()
    report: dict[str, dict] = {}
    for name, (fn, _sql) in catalog._CATALOG.items():
        rnd = last.get(name)
        span, mods = implementing_files(fn)
        changed_at = 0
        changed_by = None
        if span:
            t = span_last_change(*span)
            if t > changed_at:
                changed_at, changed_by = t, f"{span[0]}:{span[1]}-{span[2]}"
        for m in sorted(mods):
            t = file_last_change(m)
            if t > changed_at:
                changed_at, changed_by = t, m
        sampled_at = ts.get(rnd, 0) if rnd else 0
        flagged = rnd is not None and changed_at > sampled_at
        report[name] = {
            "sampled_round": rnd,
            "sampled_at": sampled_at,
            "changed_at": changed_at,
            "changed_by": changed_by,
            "flag": "CHANGED_SINCE_SAMPLED" if flagged
                    else ("NEVER_SAMPLED" if rnd is None else None),
        }

    never = [k for k, v in report.items() if v["flag"] == "NEVER_SAMPLED"]
    changed = [k for k, v in report.items() if v["flag"] == "CHANGED_SINCE_SAMPLED"]
    summary = {"n": len(report), "never_sampled": never,
               "changed_since_sampled": changed}
    out = {"summary": summary, "entries": report}
    text = json.dumps(out, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
