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

# The round-7 window, by position. Slots 1-6 are the round-5 stragglers
# that overflowed the round-6 window; slots 7-50 are the round-6
# additions (ext21-ext29, declaration order, oldest batch first —
# mm14_jpeg_roundtrip was already driver-sampled at round-6 slot 50, so
# ext21 contributes 4). All 50 have no driver row in rounds 1-6.
ROUND7_WINDOW = [
    # round-5 overflow:
    "x31_dsir_weights",
    "tx27_gopher_rules",
    "ts14_hard_negatives",
    "w15_stream_cdc_upsert",
    "tx29_ngram_coverage",
    "ts15_ivf_balance",
    # ext21 (minus mm14, sampled r6):
    "mm15_wav_silence_trim",
    "gr17_adamic_adar",
    "ts19_centroid_stats",
    "dq12_split_balance",
    # ext22:
    "tx34_ngram_novelty",
    "x40_skyline_2d",
    "gr18_clustering_coeff",
    "mm16_pixel_gini",
    "x41_nucleus_coverage",
    # ext23:
    "tx35_term_burstiness",
    "ts20_matryoshka_recall",
    "sk11_minhash_lang_sim",
    "mm17_jpeg_blockiness",
    "dq13_duplicate_burden",
    # ext24:
    "rel33_max_concurrency",
    "x43_weighted_median",
    "x44_join_card_estimate",
    "mm18_gain_normalization",
    "tx36_langid_confusion",
    # ext25:
    "tx37_bpe_fertility",
    "x45_bitmap_estimate",
    "td13_shard_dup_locality",
    "gr19_rich_club",
    "w20_stream_union_dedupe",
    # ext26:
    "ts21_nprobe_sweep",
    "sk12_cms_error_sweep",
    "tx38_garbage_score",
    "mm19_channel_correlation",
    "dq14_expectation_drift",
    # ext27:
    "gr20_modularity",
    "rel35_period_growth",
    "ts22_centroid_drift",
    "dq15_key_discovery",
    "x46_ndv_estimate_audit",
    # ext28:
    "mm20_shot_lengths",
    "sk13_histq_error_sweep",
    "ts23_pq_utilization",
    "x47_decile_lift",
    "rel36_cycle_time",
    # ext29:
    "td14_dedupe_agreement",
    "x48_top_movers",
    "rel37_top_paths",
    "mm21_frame_motion",
    "tx40_hapax_ratio",
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
    assert window == ROUND7_WINDOW, (
        "driver-gate window drifted from the plan — a batch insert "
        "displaced entries past slot 50 (the round-5 silent-displacement "
        "trap). Diff: "
        f"{[(i, a, b) for i, (a, b) in enumerate(zip(window, ROUND7_WINDOW)) if a != b]}"
    )


def test_window_maximizes_new_driver_coverage():
    """Every slot must be an entry with NO driver row in rounds 1-6 —
    the whole point of the rotation."""
    sampled = _sampled_through_round(6)
    stale = [k for k in ROUND7_WINDOW if k in sampled]
    assert not stale, f"window wastes slots on already-sampled entries: {stale}"


def test_window_plus_history_covers_catalog_minus_overflow():
    """After this round's gate runs, cumulative driver coverage should be
    the full catalog minus the documented round-8 overflow (ext30's 5).
    Guards the arithmetic behind VERDICT r6 item #1 (>=295/300)."""
    from bioeco_portal_etl_spark.catalog import queries

    sampled = _sampled_through_round(6)
    after_r7 = sampled | set(ROUND7_WINDOW)
    overflow = {
        k for k in queries() if k not in after_r7
    }
    expected_overflow = {
        "gr21_edge_support",
        "dq16_id_gaps",
        "ts24_norm_profile",
        "td15_soft_dedupe_weights",
        "mm22_crest_factor",
    }
    # Round-7 additions (registered in catalog_ext31+ modules, written
    # after this pin) are allowed to extend the overflow — they queue
    # for round 8 behind ext30. Anything else uncovered is a rotation bug.
    q = queries()
    unexpected = [
        k
        for k in sorted(overflow - expected_overflow)
        if not _is_round7_module(q[k].__module__)
    ]
    assert not unexpected, (
        f"pre-round-7 entries missing from both history and window: {unexpected}"
    )


def _is_round7_module(mod: str) -> bool:
    tail = mod.rsplit(".", 1)[-1]
    if tail.startswith("catalog_ext"):
        suffix = tail[len("catalog_ext"):]
        return suffix.isdigit() and int(suffix) >= 31
    return False


def test_no_duplicate_gate_entries():
    from bioeco_portal_etl_spark.catalog import _CATALOG, _GATE_FIRST

    assert len(set(_GATE_FIRST)) == len(_GATE_FIRST)
    assert len(set(_CATALOG.keys())) == len(_CATALOG.keys())
    missing = [k for k in _GATE_FIRST if k not in _CATALOG]
    assert not missing, f"_GATE_FIRST names not in catalog: {missing}"
