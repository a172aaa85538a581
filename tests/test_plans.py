"""Physical/optimized plan assertions (SURVEY.md §4) — the scale contract.

Correctness tests prove the engine computes the right rows; these prove it
computes them the way a 100 TB deployment needs: filters pushed into the
parquet scan, dimension joins broadcast, aggregation partial (map-side
combine), scans pruned to referenced columns, and no re-inlining of
expensive expressions below projections (the CollapseProject/pushdown traps
documented in text/dedupe.py)."""

from __future__ import annotations

import pytest

from bioeco_portal_etl_spark import catalog
from tests.conftest import SF_SMOKE


def _physical(spark, name):
    df = catalog.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(spark, name):
    df = catalog.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushed_and_partial_agg(spark):
    plan = _physical(spark, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine before the shuffle
    scan = [line for line in plan.splitlines() if "FileScan" in line][0]
    assert "l_shipdate" in scan and "DataFilters" in scan  # pushed predicate
    assert "l_comment" not in plan  # column pruning reached the scan


def test_q3_broadcasts_dimensions(spark):
    plan = _physical(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing shuffles at dimension scale
    # the BUILDING segment filter reached the customer scan
    cscan = [ln for ln in plan.splitlines() if "FileScan" in ln and "c_mktsegment" in ln]
    assert cscan and "BUILDING" in cscan[0]


def test_q6_all_predicates_pushed(spark):
    plan = _physical(spark, "q6_revenue_forecast")
    scan = [line for line in plan.splitlines() if "FileScan" in line][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan


def test_j1_broadcast_left_join(spark):
    plan = _physical(spark, "j1_broadcast_left_join")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_a1_partial_aggregation(spark):
    plan = _physical(spark, "a1_grouped_merge")
    assert "partial_" in plan  # merge agg pre-combines map-side


def test_td2_no_expression_reinlining(spark):
    """Regression: the token split must appear a bounded number of times in
    the optimized plan. Pushdown/InferFiltersFromGenerate re-inlining the
    shingle pipeline into Filter nodes showed up as split() duplication
    (was 5 copies; the fixed plan carries at most 3: token project, cheap
    token-count filter, jaccard side if present)."""
    plan = _optimized(spark, "td2_minhash_lsh")
    assert plan.count("split(") <= 3
    plan4 = _optimized(spark, "td4_jaccard_pairs")
    assert plan4.count("split(") <= 6  # two shingle branches (pairs + scores)


def test_ts1_broadcasts_queries(spark):
    plan = _physical(spark, "ts1_cosine_topk")
    assert "Broadcast" in plan  # query set is the broadcast side


def test_mm1_projects_payload_away(spark):
    """The binary payload exists only between attach and decode — it must
    not appear in the output schema (never collected/shuffled onward)."""
    df = catalog.queries()["mm1_media_metadata"](spark, SF_SMOKE)
    assert "payload" not in df.columns
    assert [f.name for f in df.schema.fields] == [
        "media_id", "n_bytes", "width", "height", "media_format",
    ]
