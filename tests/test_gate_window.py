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

# The round-10 window, by position. All 50 are REGATE_r09
# changed-since-sampled leftovers (VERDICT r9 item 1 enumerates the
# plan: 127 flagged, round 9 covered 50, these are 50 of the 77 left).
#   Slots 1-22  — mm2-mm23: the multimodal family minus mm1 (fresh r9
#                 row), tainted by the round-9 PyAV-arm edit to the
#                 shared multimodal/media.py. Numeric order.
#   Slots 23-30 — the streaming w-family leftovers. Numeric order.
#   Slots 31-50 — the 20 oldest remaining leftovers by last-sample age
#                 (18 r3-era + the first 2 of the r4 cohort: gr2, gr4),
#                 name order within each age cohort.
ROUND10_WINDOW = [
    # mm family (media.py taint), numeric order:
    "mm2_resize_meta",
    "mm3_frame_sample",
    "mm4_audio_energy",
    "mm5_scene_cuts",
    "mm6_png_channel_stats",
    "mm7_wav_clip_stats",
    "mm8_phash_groups",
    "mm9_wav_downsample",
    "mm10_patch_grid",
    "mm11_patch_dupes",
    "mm12_resize_pixels",
    "mm13_frame_zcr",
    "mm14_jpeg_roundtrip",
    "mm15_wav_silence_trim",
    "mm16_pixel_gini",
    "mm17_jpeg_blockiness",
    "mm18_gain_normalization",
    "mm19_channel_correlation",
    "mm20_shot_lengths",
    "mm21_frame_motion",
    "mm22_crest_factor",
    "mm23_jpeg_color_roundtrip",
    # w-family leftovers, numeric order:
    "w1_tumbling",
    "w2_sliding",
    "w3_session",
    "w4_sessionize",
    "w5_streaming_sessions",
    "w7_stream_interval_join",
    "w9_streaming_tumbling",
    "w18_stream_cms_topk",
    # oldest remaining leftovers (r3-era then r4), name order:
    "rel3_semi_anti",
    "rel4_conditional_pivot",
    "rel5_topk_per_group",
    "rel6_asof_join",
    "rel7_range_join",
    "rel8_json_props",
    "rel9_cube",
    "ts7_pq_refine_topk",
    "tx11_lm_score",
    "x10_url_dedupe",
    "x2_stratified_split",
    "x3_sequence_packing",
    "x4_source_cap",
    "x5_chunk_windows",
    "x6_corpus_stats",
    "x7_temperature_mix",
    "x8_fuzzy_match",
    "x9_snapshot_diff",
    "gr2_triangles",
    "gr4_degree_hist",
]

N_MM = 22  # slots 1-22: mm2-mm23
N_W = 8  # slots 23-30: w-family


def _last_sampled_round() -> dict[str, int]:
    last: dict[str, int] = {}
    for r in range(1, 10):
        p = REPO / f"CORRECTNESS_r{r:02d}.json"
        if p.exists():
            for k in json.loads(p.read_text()):
                last[k] = max(last.get(k, 0), r)
    return last


def _regate_r09_leftovers() -> set[str]:
    """The REGATE_r09 changed-since-sampled entries that did NOT get a
    round-9 driver row — the 77-entry backlog this window draws from."""
    regate = REPO / "REGATE_r09.json"
    r09 = REPO / "CORRECTNESS_r09.json"
    flagged = set(
        json.loads(regate.read_text())["summary"]["changed_since_sampled"]
    )
    sampled_r9 = set(json.loads(r09.read_text()))
    return flagged - sampled_r9


def test_window_is_exactly_the_planned_50():
    from bioeco_portal_etl_spark.catalog import _CATALOG

    window = list(_CATALOG.keys())[:50]
    assert window == ROUND10_WINDOW, (
        "driver-gate window drifted from the plan — a batch insert "
        "displaced entries past slot 50 (the round-5 silent-displacement "
        "trap). Diff: "
        f"{[(i, a, b) for i, (a, b) in enumerate(zip(window, ROUND10_WINDOW)) if a != b]}"
    )


def test_every_slot_is_a_regate_r09_leftover():
    """All 50 window entries must be REGATE_r09-flagged entries that
    round 9's window did not cover — this window exists to clear that
    backlog (VERDICT r9 item 1), nothing else belongs in it."""
    leftovers = _regate_r09_leftovers()
    not_backlog = [k for k in ROUND10_WINDOW if k not in leftovers]
    assert not not_backlog, f"window entries not in the r9 backlog: {not_backlog}"


def test_mm_slots_are_the_family_minus_mm1():
    """Slots 1-22 must be exactly mm2-mm23 — the multimodal family
    tainted by the shared media.py PyAV edit; mm1 has a fresh r9 row
    (but is re-tainted by round 10's packed-audio fix and is pinned to
    the FRONT of the round-11 window — see catalog.py's continuation
    plan)."""
    mm = ROUND10_WINDOW[:N_MM]
    expected = [
        f"mm{i}_" for i in range(2, 24)
    ]
    assert [k.split("_")[0] + "_" for k in mm] == [
        e for e in expected
    ], f"mm slots drifted: {mm}"
    leftovers = _regate_r09_leftovers()
    mm_backlog = {k for k in leftovers if k.startswith("mm")}
    assert set(mm) == mm_backlog, (
        f"missing={sorted(mm_backlog - set(mm))} extra={sorted(set(mm) - mm_backlog)}"
    )


def test_w_slots_are_the_streaming_backlog():
    """Slots 23-30 must be exactly the w-family entries in the r9
    backlog."""
    w = ROUND10_WINDOW[N_MM:N_MM + N_W]
    leftovers = _regate_r09_leftovers()
    w_backlog = {k for k in leftovers if k.startswith("w")}
    assert set(w) == w_backlog, (
        f"missing={sorted(w_backlog - set(w))} extra={sorted(set(w) - w_backlog)}"
    )


def test_refresh_slots_are_the_oldest_leftovers():
    """Slots 31-50 must be the 20 oldest non-mm non-w backlog entries by
    last driver row (r3-era first, then the r4 cohort), name order
    within each age cohort."""
    last = _last_sampled_round()
    leftovers = _regate_r09_leftovers()
    rest = sorted(
        (k for k in leftovers if not k.startswith(("mm", "w"))),
        key=lambda k: (last.get(k, 0), k),
    )
    expected = rest[: 50 - N_MM - N_W]
    refresh = ROUND10_WINDOW[N_MM + N_W:]
    assert refresh == expected, (
        f"refresh slots should be the oldest leftovers: "
        f"expected={expected} got={refresh}"
    )


def test_window_plus_history_covers_catalog():
    """Cumulative driver coverage reached 314/314 in round 8; the window
    must never reintroduce a coverage hole: history ∪ window must still
    cover every entry that existed before this round. Entries added in
    round 10+ batches (catalog_ext34 onward) queue for the next round
    and are the only tolerated overflow."""
    from bioeco_portal_etl_spark.catalog import queries

    sampled = set(_last_sampled_round())
    after = sampled | set(ROUND10_WINDOW)
    q = queries()
    uncovered = [
        k for k in sorted(set(q) - after)
        if not _is_new_round_module(q[k].__module__)
    ]
    assert not uncovered, (
        f"pre-round-10 entries missing from both history and window: {uncovered}"
    )


def _is_new_round_module(mod: str) -> bool:
    tail = mod.rsplit(".", 1)[-1]
    if tail.startswith("catalog_ext"):
        suffix = tail[len("catalog_ext"):]
        return suffix.isdigit() and int(suffix) >= 34
    return False


def test_no_duplicate_gate_entries():
    from bioeco_portal_etl_spark.catalog import _CATALOG, _GATE_FIRST

    assert len(set(_GATE_FIRST)) == len(_GATE_FIRST)
    assert len(set(_CATALOG.keys())) == len(_CATALOG.keys())
    missing = [k for k in _GATE_FIRST if k not in _CATALOG]
    assert not missing, f"_GATE_FIRST names not in catalog: {missing}"
