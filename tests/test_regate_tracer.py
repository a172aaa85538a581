"""Pins the regate tracer's implementing-code discovery
(scripts/regate_check.py), specifically the round-9 fix: a catalog entry
whose spark_fn imports its real implementation INSIDE the function body
(lazy import, the mapInPandas-closure idiom) must still have that module
traced — co_names/__globals__ alone cannot see function-local imports,
which let tx29's round-8 rewrite slip past the changed-since-sampled
rotation."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from regate_check import implementing_files  # noqa: E402

from bioeco_portal_etl_spark import catalog  # noqa: E402


def _fn(name: str):
    return catalog._CATALOG[name][0]


def test_span_points_at_defining_file():
    span, _ = implementing_files(_fn("tx29_ngram_coverage"))
    assert span is not None
    path, start, end = span
    assert path.endswith("catalog_ext13.py")
    assert 0 < start < end


def test_function_local_import_is_traced():
    # tx29's wrapper does `from ...text.ngram_coverage import ngram_coverage`
    # inside the function body — the module must appear in the traced set.
    _, mods = implementing_files(_fn("tx29_ngram_coverage"))
    assert any(m.endswith("text/ngram_coverage.py") for m in mods), mods


def test_module_level_import_still_traced():
    # q11 calls the shared loader T (module-level import in catalog_tpch) —
    # the original co_names trace must keep working alongside the new one.
    _, mods = implementing_files(_fn("q11_value_suppliers"))
    assert any(m.endswith("sources/files.py") for m in mods), mods


def test_dotted_path_in_source_resolves_through_attr_suffix():
    # A dotted reference whose last segment is an ATTRIBUTE (not a module)
    # must resolve to the containing module, not be dropped.
    def probe(spark, sf):
        import bioeco_portal_etl_spark.multimodal.media

        return bioeco_portal_etl_spark.multimodal.media.MEDIA_META_SCHEMA

    _, mods = implementing_files(probe)
    assert any(m.endswith("multimodal/media.py") for m in mods), mods


def test_docstring_mention_does_not_taint():
    """Round-10 precision fix (ADVICE r9): a dotted path that appears
    only in the DOCSTRING is a mention, not a dependency — the raw-text
    regex used to taint such entries."""
    def probe(spark, sf):
        """Same banding idea as bioeco_portal_etl_spark.text.dedupe,
        but over a different keyspace."""
        return None

    _, mods = implementing_files(probe)
    assert not any(m.endswith("text/dedupe.py") for m in mods), mods


def test_comment_mention_does_not_taint():
    def probe(spark, sf):
        # see bioeco_portal_etl_spark.graph.hyperball for the HLL trick
        return None

    _, mods = implementing_files(probe)
    assert not any(m.endswith("graph/hyperball.py") for m in mods), mods


def test_string_constant_dynamic_import_still_taints():
    # importlib.import_module("pkg.mod") style — the dotted path lives
    # in a NON-docstring string constant and must still be traced.
    def probe(spark, sf):
        import importlib

        return importlib.import_module(
            "bioeco_portal_etl_spark.text.ngram_coverage"
        )

    _, mods = implementing_files(probe)
    assert any(m.endswith("text/ngram_coverage.py") for m in mods), mods


def test_unresolvable_dotted_path_does_not_crash_or_execute():
    """The tracer must never import (= execute) modules at check time
    (ADVICE r9: a referenced module raising non-ImportError on import
    crashed the whole check). Path resolution is static; an unknown
    dotted path is simply skipped."""
    def probe(spark, sf):
        from bioeco_portal_etl_spark.does_not_exist import nothing

        return nothing

    _, mods = implementing_files(probe)  # must not raise
    assert not any("does_not_exist" in m for m in mods), mods
    assert "bioeco_portal_etl_spark.does_not_exist" not in sys.modules


def test_package_init_resolves():
    # `from bioeco_portal_etl_spark.streaming import x` where streaming
    # is a package → taint its __init__.py (file-level, conservative).
    def probe(spark, sf):
        import bioeco_portal_etl_spark.streaming

        return bioeco_portal_etl_spark.streaming

    _, mods = implementing_files(probe)
    assert any(
        m.endswith("streaming/__init__.py") or m.endswith("streaming.py")
        for m in mods
    ), mods


# ---------------------------------------------------------------------------
# Round-11 module-taint precision (VERDICT r10 item 5 + ADVICE r10): a
# referenced-module edit only taints when the entry can OBSERVE it —
# doc-only edits and edits confined to unreached top-level defs are
# classified and skipped, with the raw recency still recorded.

import regate_check  # noqa: E402
from regate_check import (  # noqa: E402
    _split_module,
    classify_module_change,
    closure_names,
)


def test_closure_names_sees_transitive_bioeco_calls():
    # An entry wrapper -> text.dedupe helper chain: names used anywhere
    # in the transitive closure must appear (td1's wrapper calls
    # exact_dedupe, which itself names its own helpers/columns).
    fn = _fn("td1_exact_dedupe")
    names = closure_names(fn)
    assert "exact_dedupe" in names, sorted(names)[:40]
    # the BFS descended INTO the implementation, not just the wrapper:
    assert len(names) > len(set(fn.__code__.co_names)), (
        "closure should be strictly larger than the wrapper's own co_names"
    )


def test_closure_names_includes_unresolved_attribute_names():
    def probe(spark, sf):
        return spark.mystery_attr(sf)

    assert "mystery_attr" in closure_names(probe)


def test_split_module_separates_defs_from_residue_and_strips_docs():
    src_a = (
        '"""module doc v1"""\n'
        "X = {'k': handler}\n"
        "def handler(v):\n"
        '    """doc v1"""\n'
        "    return v + 1\n"
        "def other(v):\n"
        "    return v\n"
    )
    src_b = src_a.replace("module doc v1", "module doc v2").replace(
        "doc v1", "doc v2"
    )
    a, b = _split_module(src_a), _split_module(src_b)
    assert a is not None and b is not None
    assert set(a[0]) == {"handler", "other"}
    assert a == b, "docstring-only delta must vanish after stripping"
    bad = _split_module("def broken(:\n")
    assert bad is None


def _fake_git(blobs):
    def fake(*args):
        if args[0] == "show":
            rev, _, path = args[1].partition(":")
            return blobs.get((rev, path), "")
        raise AssertionError(f"unexpected git call {args}")
    return fake


def test_classify_doc_only_edit_is_skipped(monkeypatch):
    old = 'def f(x):\n    """v1"""\n    return x * 2\n'
    new = 'def f(x):\n    """v2 — better prose"""\n    # new comment\n    return x * 2\n'
    monkeypatch.setattr(
        regate_check, "_git", _fake_git({("r1", "m.py"): old, ("HEAD", "m.py"): new})
    )
    regate_check._BLOB_CACHE.clear()
    assert classify_module_change("m.py", "r1") == ("module-doc", frozenset())
    regate_check._BLOB_CACHE.clear()


def test_classify_unreached_def_edit_returns_diff_names(monkeypatch):
    old = "def f(x):\n    return x\n\ndef g(x):\n    return x + 1\n"
    new = "def f(x):\n    return x\n\ndef g(x):\n    return x + 2\n"
    monkeypatch.setattr(
        regate_check, "_git", _fake_git({("r1", "m.py"): old, ("HEAD", "m.py"): new})
    )
    regate_check._BLOB_CACHE.clear()
    kind, diff = classify_module_change("m.py", "r1")
    assert (kind, diff) == ("defs", frozenset({"g"}))
    regate_check._BLOB_CACHE.clear()


def test_classify_dispatch_table_reference_taints(monkeypatch):
    # g changed AND the unchanged residue names g in a dispatch table —
    # any entry could call it without naming it, so this must taint.
    old = "TABLE = {'g': g}\n\ndef g(x):\n    return x + 1\n"
    new = "TABLE = {'g': g}\n\ndef g(x):\n    return x + 2\n"
    monkeypatch.setattr(
        regate_check, "_git", _fake_git({("r1", "m.py"): old, ("HEAD", "m.py"): new})
    )
    regate_check._BLOB_CACHE.clear()
    assert classify_module_change("m.py", "r1") == ("module", None)
    regate_check._BLOB_CACHE.clear()


def test_classify_residue_change_taints(monkeypatch):
    old = "LIMIT = 10\n\ndef f(x):\n    return x\n"
    new = "LIMIT = 20\n\ndef f(x):\n    return x\n"
    monkeypatch.setattr(
        regate_check, "_git", _fake_git({("r1", "m.py"): old, ("HEAD", "m.py"): new})
    )
    regate_check._BLOB_CACHE.clear()
    assert classify_module_change("m.py", "r1") == ("module", None)
    regate_check._BLOB_CACHE.clear()


def test_classify_missing_or_unparseable_blob_taints(monkeypatch):
    monkeypatch.setattr(
        regate_check, "_git",
        _fake_git({("HEAD", "m.py"): "def f():\n    return 1\n"}),
    )
    regate_check._BLOB_CACHE.clear()
    # file absent at the sampled rev → conservative taint
    assert classify_module_change("m.py", "r1") == ("module", None)
    regate_check._BLOB_CACHE.clear()
    monkeypatch.setattr(
        regate_check, "_git",
        _fake_git({("r1", "m.py"): "def broken(:\n",
                   ("HEAD", "m.py"): "def f():\n    return 1\n"}),
    )
    assert classify_module_change("m.py", "r1") == ("module", None)
    regate_check._BLOB_CACHE.clear()


def test_static_reach_descends_through_lazy_imports():
    """Round-11 fix: a lazily-imported entry point leaves the function
    object unresolvable in __globals__, so the dynamic closure stops at
    the NAME; the module def graph must carry it onward to helpers any
    number of hops below."""
    from regate_check import static_reach

    graph = {
        "entrypoint": {"helper_a", "np", "select"},
        "helper_a": {"helper_b"},
        "helper_b": {"deep_helper"},
        "deep_helper": {"math"},
        "unrelated": {"other"},
    }
    reach = static_reach({"entrypoint", "col"}, graph)
    assert {"helper_a", "helper_b", "deep_helper"} <= reach
    assert "unrelated" not in reach


def test_module_def_graph_reads_head_blob(monkeypatch):
    src = (
        "import os\n"
        "def top(x):\n"
        "    return helper(x) + os.sep\n"
        "def helper(x):\n"
        "    return obj.attr_ref\n"
        "class K:\n"
        "    def m(self):\n"
        "        return deep()\n"
    )
    monkeypatch.setattr(
        regate_check, "_git", _fake_git({("HEAD", "g.py"): src})
    )
    regate_check._DEF_GRAPH_CACHE.clear()
    g = regate_check.module_def_graph("g.py")
    assert "helper" in g["top"]
    assert "attr_ref" in g["helper"]  # Attribute attrs count as refs
    assert "deep" in g["K"]  # class bodies are one unit
    regate_check._DEF_GRAPH_CACHE.clear()


def test_media_py_graph_descends_lazy_import_to_pyav_helper():
    """End-to-end on the real repo's media.py: a consumer that lazily
    imports decode_audio must reach _frame_channel_count (the round-11
    edited helper) two hops down — decode_audio -> _av_decode_audio ->
    _frame_channel_count — so an edit there taints that consumer. And
    the mm4 catalog entry, which uses audio_frame_features' injectable
    decode SEAM instead of decode_audio, must NOT reach it: the
    round-11 'module-unreached' skip for the mm family is exact, not
    lucky."""
    from regate_check import module_def_graph, static_reach

    regate_check._DEF_GRAPH_CACHE.clear()
    media = "bioeco_portal_etl_spark/multimodal/media.py"
    g = module_def_graph(media)

    def probe(spark, sf):
        from bioeco_portal_etl_spark.multimodal.media import decode_audio

        return decode_audio(b"")

    reach = static_reach(closure_names(probe), g)
    assert "_frame_channel_count" in reach

    mm4_reach = static_reach(closure_names(_fn("mm4_audio_energy")), g)
    assert "_frame_channel_count" not in mm4_reach
    regate_check._DEF_GRAPH_CACHE.clear()


def test_joint_reach_crosses_module_boundaries_below_lazy_imports():
    """Round-11 follow-up: entry -> a.f (lazy import: dynamic closure
    stops at the name 'f') -> b.g -> b.deep. Module b's graph alone
    never sees 'g' in the seeds; the joint fixpoint across a's and b's
    graphs must carry it over so an edit to b.deep taints."""
    from regate_check import joint_static_reach

    graphs = {
        "a.py": {"f": {"g", "pd"}},
        "b.py": {"g": {"deep"}, "deep": {"math"}, "island": {"x"}},
    }
    reach = joint_static_reach({"f"}, graphs)
    assert {"g", "deep"} <= reach
    assert "island" not in reach


class _FakeBioecoClass:
    """Stand-in for a package class (module name faked below): its
    staticmethod body references a helper the closure must see."""

    @staticmethod
    def sm(x):
        return _xyz_static_helper(x)  # noqa: F821 — name capture is the point

    @classmethod
    def cm(cls, x):
        return _xyz_class_helper(x)  # noqa: F821


_FakeBioecoClass.__module__ = "bioeco_fake_for_test"


def test_staticmethod_and_classmethod_bodies_contribute_names():
    """Review round-11: raw staticmethod/classmethod descriptors have no
    __code__, so pushing them unwrapped silently dropped their bodies
    from the closure — an edit to a helper they call was then
    mis-skipped."""
    def probe(spark, sf):
        return _FakeBioecoClass.sm(sf) + _FakeBioecoClass.cm(sf)

    names = closure_names(probe)
    assert "_xyz_static_helper" in names
    assert "_xyz_class_helper" in names


def test_residue_referenced_defs_seed_the_reach(monkeypatch):
    """Review round-11: unchanged residue TABLE = {'k': handler} where
    unchanged handler() calls an EDITED helper(). The entry's closure
    never names handler or helper (it calls TABLE['k'](...)), so reach
    must be seeded by the residue's references and expanded through the
    def graph — otherwise the observable edit is mis-skipped."""
    from regate_check import joint_static_reach, module_residue_refs

    src = (
        "TABLE = {'k': handler}\n"
        "def handler(x):\n"
        "    return helper(x)\n"
        "def helper(x):\n"
        "    return x + 1\n"
    )
    monkeypatch.setattr(
        regate_check, "_git", _fake_git({("HEAD", "m.py"): src})
    )
    regate_check._DEF_GRAPH_CACHE.clear()
    regate_check._RESIDUE_REFS_CACHE.clear()
    graph = regate_check.module_def_graph("m.py")
    seeds = {"TABLE"} | module_residue_refs("m.py")  # entry closure + residue
    reach = joint_static_reach(seeds, {"m.py": graph})
    assert "handler" in reach and "helper" in reach
    regate_check._DEF_GRAPH_CACHE.clear()
    regate_check._RESIDUE_REFS_CACHE.clear()
