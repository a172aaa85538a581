"""Pins the driver-gate WINDOW — the first 50 entries of the catalog's
declaration order, which are the only ones the external correctness
driver hash-samples each round.

Round-5 postmortem: inserting a new batch into _GATE_FIRST silently
pushed 5 intended entries past slot 50; nothing failed locally because
validate.py checks ALL entries — the displacement was only caught by
hand-re-listing positions. This test makes window membership a pinned,
reviewable artifact: editing _GATE_FIRST without updating the pin (or
vice versa) fails immediately.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The round-6 window, by position. Slot 1 is the de-vacuated
# tx31_doc_cosine (its round-5 driver row compared 0 rows vs 0 rows);
# slots 2-50 are the 49 longest-parked never-driver-sampled round-5
# entries, oldest batch first.
ROUND6_WINDOW = [
    "tx31_doc_cosine",
    # ext5:
    "gr6_dup_components",
    "dq3_split_leakage",
    "x22_incremental_agg",
    "mm6_png_channel_stats",
    "ts9_recall_at_k",
    "mm7_wav_clip_stats",
    "x23_scd2_history",
    "tx20_winnow_fingerprints",
    "w11_stream_static_enrich",
    "dq4_psi_drift",
    "ts10_sq8_topk",
    # ext6:
    "dq5_k_anonymity",
    "tx21_bpe_merges",
    "td11_semantic_dedupe",
    "x24_zorder_layout",
    "dq6_benford",
    "mm8_phash_groups",
    "w12_stream_outer_join",
    # ext7:
    "tx22_bm25",
    "ts11_rrf_fusion",
    "gr7_label_communities",
    "gr8_kcore",
    "dq7_profile_drift",
    "x25_salted_join",
    # ext8:
    "tx23_heavy_hitters",
    "tx24_bpe_encode",
    "x26_bloom_join",
    "dq8_lateness_audit",
    "rel26_pivot",
    "mm9_wav_downsample",
    # ext9:
    "w13_stream_two_level_agg",
    "td12_lsh_quality",
    "x27_epoch_shuffle",
    "x28_compaction_plan",
    "tx25_blocklist_filter",
    "rel27_rolling_slope",
    # ext10/11:
    "gr9_hits",
    "ts12_range_search",
    "x29_cdc_net_effect",
    # later-displaced remainder:
    "tx26_rake_keywords",
    "ts13_filtered_ann",
    "w14_stream_complete_topk",
    "gr10_random_walks",
    "x30_scd2_asof",
    "rel28_percent_rank",
    "rel29_grouping_sets",
    "sk7_hll_merge",
    "dq9_fd_violations",
    # slot 50: round-6 JPEG codec entry (driver-green-on-real-JPEG goal);
    # x31_dsir_weights displaced to the round-7 queue
    "mm14_jpeg_roundtrip",
]


def _sampled_through_round(n: int) -> set[str]:
    s: set[str] = set()
    for r in range(1, n + 1):
        p = REPO / f"CORRECTNESS_r{r:02d}.json"
        if p.exists():
            s |= set(json.loads(p.read_text()).keys())
    return s


def test_window_is_exactly_the_planned_50():
    from bioeco_portal_etl_spark.catalog import _CATALOG

    window = list(_CATALOG.keys())[:50]
    assert window == ROUND6_WINDOW, (
        "driver-gate window drifted from the plan — a batch insert "
        "displaced entries past slot 50 (the round-5 silent-displacement "
        "trap). Diff: "
        f"{[(i, a, b) for i, (a, b) in enumerate(zip(window, ROUND6_WINDOW)) if a != b]}"
    )


def test_window_maximizes_new_driver_coverage():
    """Every slot after tx31 must be an entry with NO driver row in
    rounds 1-5 — the whole point of the rotation. (tx31 HAS a round-5
    row, but a vacuous one; it re-gates deliberately.)"""
    sampled = _sampled_through_round(5)
    stale = [k for k in ROUND6_WINDOW[1:] if k in sampled]
    assert not stale, f"window wastes slots on already-sampled entries: {stale}"


def test_no_duplicate_gate_entries():
    from bioeco_portal_etl_spark.catalog import _CATALOG, _GATE_FIRST

    assert len(set(_GATE_FIRST)) == len(_GATE_FIRST)
    assert len(set(_CATALOG.keys())) == len(_CATALOG.keys())
    missing = [k for k in _GATE_FIRST if k not in _CATALOG]
    assert not missing, f"_GATE_FIRST names not in catalog: {missing}"
