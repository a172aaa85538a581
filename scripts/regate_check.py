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

MODULE-TAINT PRECISION (round 11, VERDICT r10 item 5): a module-level
taint is no longer "any commit anywhere in the referenced file". The
file's blob at the sampled commit is AST-diffed against HEAD:
  * docstring/comment-only edits (identical docstring-stripped AST)
    are classified 'module-doc' and do NOT flag;
  * edits confined to top-level defs that the entry's transitive call
    closure cannot reach — where "reach" expands the closure's names
    through the module's own static def-reference graph, so lazy
    function-local imports still descend (round-11 fix) — and that the
    unchanged module-level residue never references (the
    dispatch-table guard) are classified 'module-unreached' and do
    NOT flag;
  * anything else — residue changes (constants, dispatch tables,
    import-time code), changes to reached defs, unparseable blobs,
    files absent at the sampled commit — flags as before.
Skipped taints are still recorded per entry (`skipped_module_taints`)
and the RAW file-level recency is always recorded as
`module_changed_at`/`module_changed_by` (ADVICE r10: span-outranking
must not erase module recency from the artifact).

Limitations (documented, acceptable for a rotation heuristic): indirect
calls through data structures aren't traced, so a changed def invoked
ONLY via a dispatch table defined in a DIFFERENT module can be
mis-skipped (same-module tables are caught by the residue-reference
guard; name-level reach is the closure's co_names — unresolved names
included — expanded to a FIXPOINT across every referenced module's
static def-reference graph, so lazily-imported chains that hop modules
still descend; bare-name matching over-expands rather than
under-expands). Everything else errs toward re-sampling, never toward
skipping.

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


def sampled_rounds(
    max_round: int | None = None, repo: Path | None = None
) -> dict[str, int]:
    last: dict[str, int] = {}
    # CORRECTNESS_r*.json, not r0* — the old pattern silently dropped
    # round 10+ (two-digit rounds start "r1"), so every round-10 sample
    # would have stayed "stale" forever (round-11 find).
    #
    # max_round freezes the age basis for window-pin tests: a round-N
    # window is derived from rounds <= N-1, so its pin must ignore any
    # CORRECTNESS file a LATER round (or the current round's driver)
    # drops into the tree — otherwise committing the very artifact the
    # window produces invalidates the membership test (round-11 ADVICE).
    for f in sorted(glob.glob(str((repo or REPO) / "CORRECTNESS_r[0-9]*.json"))):
        rnd = int(Path(f).stem.split("_r")[1])
        if max_round is not None and rnd > max_round:
            continue
        for name, row in json.load(open(f)).items():
            # only a GREEN row counts as driver verification
            if row.get("rows_match") and row.get("hash_match", True):
                last[name] = max(last.get(name, 0), rnd)
    return last


def round_timestamps() -> dict[int, tuple[int, str]]:
    """round -> (commit timestamp, commit sha) of the commit that ADDED
    that round's CORRECTNESS file. The sha anchors the blob-diff module
    classification: "what did this module look like when the driver
    sampled the entry?"."""
    ts: dict[int, tuple[int, str]] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9]*.json"))):
        rnd = int(Path(f).stem.split("_r")[1])
        out = _git("log", "--diff-filter=A", "-1", "--format=%ct %H",
                   "--", Path(f).name)
        if out:
            t, rev = out.split()
            ts[rnd] = (int(t), rev)
    return ts


_DOTTED = None  # compiled lazily; module may be imported without re


def _dotted_candidates(src_text: str) -> set[str]:
    """Dotted `bioeco_portal_etl_spark.*` paths the function may import
    at call time — extracted from the AST, not raw text.

    Round-10 precision fix (ADVICE r9): the previous raw-text regex
    matched dotted paths inside docstrings and comments, tainting
    entries that merely MENTION a module (and round 9's 127-entry flag
    wave showed how coarse that is). Comments never reach the AST;
    docstring constants are excluded explicitly. Captured:
      * `import pkg.mod` / `from pkg.mod import name` nodes,
      * dotted ATTRIBUTE chains (`pkg.mod.helper(...)` usage),
      * non-docstring string constants (dynamic
        `importlib.import_module("pkg.mod")` imports).
    Falls back to the raw-text regex when the source does not parse
    standalone — erring toward re-sampling, never toward skipping."""
    import ast
    import re
    import textwrap

    global _DOTTED
    if _DOTTED is None:
        _DOTTED = re.compile(r"bioeco_portal_etl_spark(?:\.\w+)+")
    try:
        tree = ast.parse(textwrap.dedent(src_text))
    except SyntaxError:
        return set(_DOTTED.findall(src_text))
    doc_nodes: set[int] = set()
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(node, (ast.Module, ast.FunctionDef,
                              ast.AsyncFunctionDef, ast.ClassDef))
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            doc_nodes.add(id(body[0].value))
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                found.update(_DOTTED.findall(a.name))
        elif isinstance(node, ast.ImportFrom):
            if node.module:
                found.update(_DOTTED.findall(node.module))
                for a in node.names:
                    found.update(_DOTTED.findall(f"{node.module}.{a.name}"))
        elif (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and id(node) not in doc_nodes
        ):
            found.update(_DOTTED.findall(node.value))
        elif isinstance(node, ast.Attribute):
            parts = [node.attr]
            cur = node.value
            while isinstance(cur, ast.Attribute):
                parts.append(cur.attr)
                cur = cur.value
            if isinstance(cur, ast.Name):
                parts.append(cur.id)
                found.update(_DOTTED.findall(".".join(reversed(parts))))
    return found


def _dotted_to_repo_file(dotted: str) -> str | None:
    """Map a dotted path to its repo file WITHOUT importing it.

    Round-10 hardening (ADVICE r9): importlib.import_module executes
    module code at check time, so a module raising anything other than
    ImportError on import (optional dep surfacing as AttributeError /
    OSError...) crashed the whole regate check. Pure path resolution has
    no execution at all: try the longest prefix that is a file under the
    repo (`pkg.mod.attr` matches too — shorter prefixes handle the
    trailing-attribute case)."""
    parts = dotted.split(".")
    for k in range(len(parts), 0, -1):
        base = REPO.joinpath(*parts[:k])
        py = base.with_suffix(".py")
        if py.is_file():
            return str(py.relative_to(REPO))
        init = base / "__init__.py"
        if init.is_file():
            return str(init.relative_to(REPO))
    return None


def implementing_files(fn) -> tuple[tuple[str, int, int] | None, set[str]]:
    """(defining file, span start, span end) + referenced package modules.

    TAINT-EDGE CLASSES (VERDICT r9 item 6 — the artifact's per-entry
    `taint` field records which class fired, so window planning can
    prioritize truly-edited entries over transitively-tainted ones):
      * SPAN-level — the fn's own source span, traced through history
        with `git log -L start,end:file`; an edit here means the entry's
        OWN logic changed. High-priority regate signal.
      * MODULE-level (file granularity, deliberately conservative) —
        every bioeco_* module the fn references, via two traces:
        __globals__ lookup of co_names (module-level imports) and the
        AST dotted-path scan above (function-LOCAL imports, which
        co_names cannot see — round-9 fix: tx29's lazy import). Any
        commit anywhere in a referenced file taints the entry, even if
        the edited lines are a code path the entry never runs (e.g. the
        PyAV arm of media.py tainting all of mm1-mm23). Lower-priority:
        re-sample when slots allow."""
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
    for dotted in _dotted_candidates(src_text):
        rel = _dotted_to_repo_file(dotted)
        if rel is not None:
            mods.add(rel)
    return span, mods


def closure_names(fn) -> set[str]:
    """Every name the entry's transitive bioeco call closure mentions —
    co_names of the fn itself, of every nested code object
    (comprehensions, lambdas, local defs), and of every bioeco-package
    callable reachable through __globals__ / module-attribute access,
    followed transitively (class reachability includes the methods in
    the class __dict__). UNRESOLVED names are included on purpose: a
    changed module def whose name appears anywhere in the closure's
    co_names must still taint (second guard for getattr-style call
    sites the resolver cannot follow)."""
    import inspect as _inspect

    names: set[str] = set()
    seen: set[int] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        code = getattr(f, "__code__", None)
        if code is None or id(code) in seen:
            continue
        seen.add(id(code))
        local: set[str] = set(code.co_names)
        consts = list(code.co_consts)
        while consts:
            c = consts.pop()
            if isinstance(c, types.CodeType):
                local.update(c.co_names)
                consts.extend(c.co_consts)
        names.update(local)
        g = getattr(f, "__globals__", {})
        for name in local:
            obj = g.get(name)
            if obj is None:
                continue
            targets = []
            if isinstance(obj, types.ModuleType):
                if getattr(obj, "__name__", "").startswith("bioeco"):
                    # module-attribute calls: any co_name may be the attr
                    targets.extend(
                        getattr(obj, a) for a in local if hasattr(obj, a)
                    )
            else:
                targets.append(obj)
            for t in targets:
                if not getattr(t, "__module__", "") or not str(
                    t.__module__
                ).startswith("bioeco"):
                    continue
                if _inspect.isclass(t):
                    names.add(getattr(t, "__name__", ""))
                    # unwrap staticmethod/classmethod: the raw descriptor
                    # has no __code__, so pushing it unwrapped silently
                    # contributed no co_names (review round-11)
                    stack.extend(
                        getattr(v, "__func__", v) for v in vars(t).values()
                        if callable(v) or isinstance(v, (staticmethod, classmethod))
                    )
                elif callable(t):
                    names.add(getattr(t, "__name__", ""))
                    inner = getattr(t, "__func__", t)  # unwrap bound/static
                    stack.append(getattr(inner, "__wrapped__", inner))
    names.discard("")
    return names


def _strip_docstrings(tree):
    """Drop every docstring Expr in-place so ast.dump compares code, not
    prose (comments never reach the AST at all)."""
    import ast

    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(node, (ast.Module, ast.FunctionDef,
                              ast.AsyncFunctionDef, ast.ClassDef))
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return tree


def _split_module(src: str):
    """(top-level def name -> docstring-stripped dump, residue dumps).
    Residue = every module-level statement that is not a def/class —
    imports, constants, dispatch tables, import-time code. Returns None
    when the source does not parse (caller taints conservatively)."""
    import ast

    try:
        tree = _strip_docstrings(ast.parse(src))
    except SyntaxError:
        return None
    defs: dict[str, str] = {}
    residue: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            defs[node.name] = ast.dump(node)
        else:
            residue.append(ast.dump(node))
    return defs, residue


_DEF_GRAPH_CACHE: dict[str, dict[str, set[str]]] = {}
_RESIDUE_REFS_CACHE: dict[str, set[str]] = {}


def module_residue_refs(path: str) -> set[str]:
    """Names referenced from the module's top-level residue (populated
    as a side effect of module_def_graph)."""
    if path not in _RESIDUE_REFS_CACHE:
        module_def_graph(path)
    return _RESIDUE_REFS_CACHE.get(path, set())


def module_def_graph(path: str) -> dict[str, set[str]]:
    """Top-level def/class name -> every identifier its body mentions
    (Name ids + Attribute attrs), from the HEAD blob. The static
    reference graph that lets the closure descend through LAZY imports:
    a catalog fn doing `from ...media import audio_frame_features`
    inside its body leaves the function object unresolvable in
    __globals__, so the dynamic BFS stops at the NAME — this graph
    carries the name onward to everything that def can call in its own
    module (round-11 fix: without it, an edit to a helper two hops
    below a lazy import was mis-classified 'module-unreached')."""
    if path in _DEF_GRAPH_CACHE:
        return _DEF_GRAPH_CACHE[path]
    import ast

    src = _git("show", f"HEAD:{path}")
    graph: dict[str, set[str]] = {}
    residue_refs: set[str] = set()
    try:
        tree = ast.parse(src) if src else None
    except SyntaxError:
        tree = None
    if tree is not None:
        for node in tree.body:
            refs: set[str] = set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name):
                    refs.add(sub.id)
                elif isinstance(sub, ast.Attribute):
                    refs.add(sub.attr)
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                graph[node.name] = refs
            else:
                # module-level residue (constants, dispatch tables,
                # import-time code): every name it mentions is callable
                # by ANY entry without appearing in that entry's
                # closure — e.g. TABLE = {'k': handler} where handler
                # transitively calls an edited helper. These names seed
                # the reach for every consumer of the module (review
                # round-11: without this, an edit to a helper below a
                # residue-referenced def was mis-skipped).
                residue_refs |= refs
    _DEF_GRAPH_CACHE[path] = graph
    _RESIDUE_REFS_CACHE[path] = residue_refs
    return graph


def static_reach(seeds: set[str], graph: dict[str, set[str]]) -> set[str]:
    """Transitive closure of `seeds` through the module def graph —
    the set of top-level defs the entry could reach in that module.
    Spurious seeds (co_names carry every attribute name used anywhere
    in the closure) can only over-expand the reach, i.e. over-taint —
    the safe direction."""
    reached = set(seeds)
    frontier = [s for s in seeds if s in graph]
    while frontier:
        cur = frontier.pop()
        for ref in graph.get(cur, ()):
            if ref not in reached:
                reached.add(ref)
                if ref in graph:
                    frontier.append(ref)
    return reached


def joint_static_reach(
    seeds: set[str], graphs: dict[str, dict[str, set[str]]]
) -> set[str]:
    """Fixpoint of static_reach across EVERY referenced module's graph
    at once. Per-module expansion alone under-taints chains that hop
    modules below a lazy import: entry -> a.f (lazy, so the dynamic
    closure stops at the name 'f') -> b.g -> b.deep. Module b's
    expansion of the raw seeds misses 'g' because only a's graph knows
    f mentions g. Iterating a's and b's graphs to a shared fixpoint
    carries the name across. Bare-name matching across modules can
    only OVER-expand (two modules sharing a def name both taint) —
    the safe direction."""
    reached = set(seeds)
    changed = True
    while changed:
        changed = False
        for graph in graphs.values():
            for name in list(reached & set(graph)):
                new = graph[name] - reached
                if new:
                    reached |= new
                    changed = True
    return reached


_BLOB_CACHE: dict[tuple[str, str], tuple | None] = {}


def classify_module_change(path: str, sampled_rev: str):
    """Classify the net change of `path` between the sampled commit and
    HEAD. Returns one of
      ("module", None)            — real taint (residue changed, blob
                                    missing/unparseable, or caller must
                                    check diff_names)
      ("module-doc", frozenset()) — docstring/comment-only, never taints
      ("defs", diff_names)        — only top-level defs changed, residue
                                    identical and none of the changed
                                    names referenced from residue; the
                                    caller taints iff diff_names
                                    intersects the entry's closure.
    Cached per (path, rev) — the per-entry part is just the closure
    intersection."""
    key = (path, sampled_rev)
    if key in _BLOB_CACHE:
        return _BLOB_CACHE[key]
    old = _git("show", f"{sampled_rev}:{path}")
    new = _git("show", f"HEAD:{path}")
    result = ("module", None)
    if old and new:
        so, sn = _split_module(old), _split_module(new)
        if so is not None and sn is not None:
            old_defs, old_res = so
            new_defs, new_res = sn
            if old_defs == new_defs and old_res == new_res:
                result = ("module-doc", frozenset())
            elif old_res == new_res:
                diff = frozenset(
                    n for n in set(old_defs) | set(new_defs)
                    if old_defs.get(n) != new_defs.get(n)
                )
                # dispatch-table guard: a changed def referenced from the
                # (unchanged) residue — e.g. CODECS = {"png": _decode_png}
                # — can be called by ANY entry without naming it; taint.
                res_text = "\n".join(new_res)
                referenced = any(
                    f"id='{n}'" in res_text or f"attr='{n}'" in res_text
                    for n in diff
                )
                result = ("module", None) if referenced else ("defs", diff)
    _BLOB_CACHE[key] = result
    return result


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
        taint = None  # 'span' = own logic edited; 'module' = referenced
        # file edited in a way the entry can observe (see the precision
        # classification in the module docstring). VERDICT r9 item 6: a
        # span taint that postdates the sample outranks a module taint
        # even when the module file's commit is newer — "truly edited"
        # entries go to the front of the window.
        sampled_at, sampled_rev = ts.get(rnd, (0, None)) if rnd else (0, None)
        if span:
            t = span_last_change(*span)
            if t > changed_at:
                changed_at, changed_by, taint = t, f"{span[0]}:{span[1]}-{span[2]}", "span"
        span_taints = changed_at > sampled_at and rnd is not None
        # ADVICE r10: raw file-level module recency, recorded regardless
        # of classification or span-outranking, so artifact consumers
        # never lose "when did ANY referenced file last change".
        module_changed_at = 0
        module_changed_by = None
        skipped: dict[str, str] = {}
        reach: set[str] | None = None  # built lazily, once per entry
        for m in sorted(mods):
            t = file_last_change(m)
            if t > module_changed_at:
                module_changed_at, module_changed_by = t, m
            if t > sampled_at and sampled_rev is not None:
                # changed since the driver sample: classify before
                # tainting (round-11 precision, VERDICT r10 item 5)
                kind, diff = classify_module_change(m, sampled_rev)
                if kind == "defs":
                    if reach is None:
                        graphs = {x: module_def_graph(x) for x in mods}
                        seeds = closure_names(fn)
                        # residue-referenced names are callable by any
                        # consumer without appearing in its closure
                        # (dispatch tables) — seed them too
                        for x in mods:
                            seeds |= module_residue_refs(x)
                        reach = joint_static_reach(seeds, graphs)
                    kind = "module" if diff & reach else "module-unreached"
                if kind != "module":
                    skipped[m] = kind
                    continue
            if t > changed_at and not span_taints:
                changed_at, changed_by, taint = t, m, "module"
        flagged = rnd is not None and changed_at > sampled_at
        report[name] = {
            "sampled_round": rnd,
            "sampled_at": sampled_at,
            "changed_at": changed_at,
            "changed_by": changed_by,
            "module_changed_at": module_changed_at,
            "module_changed_by": module_changed_by,
            "skipped_module_taints": skipped or None,
            "taint": taint if flagged else None,
            "flag": "CHANGED_SINCE_SAMPLED" if flagged
                    else ("NEVER_SAMPLED" if rnd is None else None),
        }

    never = [k for k, v in report.items() if v["flag"] == "NEVER_SAMPLED"]
    changed = [k for k, v in report.items() if v["flag"] == "CHANGED_SINCE_SAMPLED"]
    summary = {"n": len(report), "never_sampled": never,
               "changed_since_sampled": changed,
               "changed_span_level": [
                   k for k in changed if report[k]["taint"] == "span"],
               "changed_module_level": [
                   k for k in changed if report[k]["taint"] == "module"],
               # entries with module edits since their sample that the
               # classifier proved unobservable (doc-only or unreached
               # defs) — informational, deliberately NOT flagged
               "skipped_taint_entries": sorted(
                   k for k, v in report.items() if v["skipped_module_taints"])}
    out = {"summary": summary, "entries": report}
    text = json.dumps(out, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
