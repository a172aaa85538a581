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

# The round-8 window, by position.
#   Slots 1-19  — every entry with no driver row in rounds 1-7 (ext30
#                 overflow + all round-7 additions); after round 8 the
#                 driver has sampled the full catalog at least once.
#   Slots 20-21 — changed-since-sampled re-gates with span-level edits
#                 (scripts/regate_check.py / REGATE_r08.json): function
#                 bodies edited after their round-4 driver rows.
#   Slots 22-50 — longest-since-sampled refresh: 29 of the 49 round-2-era
#                 entries, name order (all also regate-flagged via the
#                 shared loader's round-7 edit).
ROUND8_WINDOW = [
    # never-sampled (ext30 overflow):
    "gr21_edge_support",
    "dq16_id_gaps",
    "ts24_norm_profile",
    "td15_soft_dedupe_weights",
    "mm22_crest_factor",
    # never-sampled (round-7 ext31):
    "mm23_jpeg_color_roundtrip",
    "td16_minhash_error_sweep",
    "tx41_rank_stability",
    "ts25_dim_covariance",
    "x49_poisson_bootstrap",
    # never-sampled (round-7 ext32):
    "x50_ks_test",
    "tx42_js_divergence",
    "gr22_assortativity",
    "td17_truncation_dupes",
    "rel38_time_weighted_avg",
    # never-sampled (round-7 ext33):
    "w21_stream_locf_segments",
    "x51_exact_quantiles",
    "gr23_degree_inequality",
    "dq17_freshness_lag",
    # span-level changed-since-sampled re-gates:
    "x19_group_normalize",
    "gr5_node_similarity",
    # r2-era refresh (oldest driver rows), name order:
    "a1_grouped_merge",
    "a2_dedupe_keep_first",
    "a3_duplicate_audit",
    "a4_make_unique",
    "f_filters",
    "g1_point_wkt",
    "g2_multipoint_union",
    "g5_geom_type",
    "g7_linestring_track",
    "g9_union_points_geojson",
    "j1_broadcast_left_join",
    "j4_differing_key_names",
    "p12_make_identifier",
    "p18_row_number",
    "p19_sql_script",
    "p1_select_rename",
    "p6_recode_passthrough",
    "p7_str_trunc",
    "p8_p9_year_dates",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "r2_unpivot_flags",
    "td1_exact_dedupe",
    "td2_minhash_lsh",
    "td3_simhash",
    "td4_jaccard_pairs",
    "td5_embedding_neardup",
]

N_NEVER_SAMPLED = 19  # slots 1-19 must have no driver row through round 7


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
    assert window == ROUND8_WINDOW, (
        "driver-gate window drifted from the plan — a batch insert "
        "displaced entries past slot 50 (the round-5 silent-displacement "
        "trap). Diff: "
        f"{[(i, a, b) for i, (a, b) in enumerate(zip(window, ROUND8_WINDOW)) if a != b]}"
    )


def test_never_sampled_debt_fully_scheduled():
    """Slots 1-19 must be EXACTLY the entries with no driver row in
    rounds 1-7 — after this round's gate, cumulative driver coverage is
    the full catalog (VERDICT r7 item #1)."""
    from bioeco_portal_etl_spark.catalog import queries

    sampled = _sampled_through_round(7)
    never = {k for k in queries() if k not in sampled}
    head = set(ROUND8_WINDOW[:N_NEVER_SAMPLED])
    assert head == never, (
        f"slots 1-{N_NEVER_SAMPLED} != never-sampled set. "
        f"missing={sorted(never - head)} extra={sorted(head - never)}"
    )


def test_refresh_slots_are_resamples_of_oldest_rows():
    """Slots 20-50 re-sample entries the driver HAS seen — the two
    span-level regate flags first, then the r2-era cohort (the oldest
    rows in CORRECTNESS history)."""
    sampled_r2 = _sampled_through_round(2)
    regate = ROUND8_WINDOW[N_NEVER_SAMPLED:N_NEVER_SAMPLED + 2]
    assert regate == ["x19_group_normalize", "gr5_node_similarity"]
    refresh = ROUND8_WINDOW[N_NEVER_SAMPLED + 2:]
    not_r2 = [k for k in refresh if k not in sampled_r2]
    assert not not_r2, f"refresh slots should be r2-era rows: {not_r2}"
    assert refresh == sorted(refresh), "r2-era refresh must be name-ordered"


def test_window_plus_history_covers_catalog():
    """After this round's gate runs, cumulative driver coverage is
    314/314. Entries added in round 8+ batches (catalog_ext34 onward)
    would queue for round 9 and are the only tolerated overflow."""
    from bioeco_portal_etl_spark.catalog import queries

    sampled = _sampled_through_round(7)
    after_r8 = sampled | set(ROUND8_WINDOW)
    q = queries()
    uncovered = [
        k for k in sorted(set(q) - after_r8)
        if not _is_round8_module(q[k].__module__)
    ]
    assert not uncovered, (
        f"pre-round-8 entries missing from both history and window: {uncovered}"
    )


def _is_round8_module(mod: str) -> bool:
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
