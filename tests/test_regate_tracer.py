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
