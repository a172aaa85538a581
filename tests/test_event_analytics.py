"""Unit semantics for the event-analytics operators (attribution, cohort
retention, Markov transitions) on hand-built streams where the expected
output is computable by eye — the catalog oracle re-checks the same ops
statistically at sf0.001/0.01."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, sec)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_attribution_first_last_touch_and_organic_drop(spark):
    from bioeco_portal_etl_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        # user 1: click -> view -> purchase(10): ft=click, lt=view
        (1, _ts(1, 1), 1, "click", 0.0),
        (2, _ts(1, 2), 1, "view", 0.0),
        (3, _ts(1, 3), 1, "purchase", 10.0),
        # user 1 second purchase(5) later: ft=click, lt=view (still)
        (4, _ts(1, 4), 1, "purchase", 5.0),
        # user 2: organic purchase (no touches) -> dropped
        (5, _ts(2, 1), 2, "purchase", 99.0),
        # user 3: view -> purchase(7): both models credit view
        (6, _ts(3, 1), 3, "view", 0.0),
        (7, _ts(3, 2), 3, "purchase", 7.0),
    ]
    out = attribute_conversions(
        _events(spark, rows), "user_id", "ts", "event_type", "value", "purchase"
    )
    got = {r["channel"]: r.asDict() for r in out.collect()}
    assert set(got) == {"click", "view"}
    assert got["click"]["ft_conversions"] == 2  # user 1's two purchases
    assert got["click"]["ft_revenue"] == 15.0
    assert got["click"]["lt_conversions"] == 0
    assert got["view"]["lt_conversions"] == 3  # u1 x2 + u3
    assert got["view"]["lt_revenue"] == 22.0
    assert got["view"]["ft_conversions"] == 1  # u3 only
    assert got["view"]["ft_revenue"] == 7.0


def test_attribution_purchase_never_self_credits(spark):
    from bioeco_portal_etl_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        (1, _ts(1, 1), 1, "purchase", 1.0),  # organic
        (2, _ts(1, 2), 1, "click", 0.0),
        (3, _ts(1, 3), 1, "purchase", 2.0),  # lt must skip purchase@1
    ]
    out = attribute_conversions(
        _events(spark, rows), "user_id", "ts", "event_type", "value", "purchase"
    ).collect()
    assert len(out) == 1 and out[0]["channel"] == "click"
    assert out[0]["lt_conversions"] == 1 and out[0]["lt_revenue"] == 2.0


def test_attribution_custom_id_col(spark):
    """The tie-break id column is a parameter (round-4 ADVICE): a stream
    whose unique id is NOT named event_id must work, and same-timestamp
    touches must resolve by id order."""
    from bioeco_portal_etl_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        # same-ts touches: id order decides ft=click, lt=view
        (1, _ts(1, 1), 1, "click", 0.0),
        (2, _ts(1, 1), 1, "view", 0.0),
        (3, _ts(1, 2), 1, "purchase", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "uid long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        r["channel"]: r.asDict()
        for r in attribute_conversions(
            df, "user_id", "ts", "event_type", "value", "purchase", id_col="uid"
        ).collect()
    }
    assert got["click"]["ft_conversions"] == 1
    assert got["view"]["lt_conversions"] == 1


def test_cohort_retention_triangle(spark):
    from bioeco_portal_etl_spark.operators.cohorts import cohort_retention

    rows = [
        # users 1,2 first seen week 0; user 1 returns week 1; user 3 joins week 1
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(2), 2, "view", 0.0),
        (3, _ts(8), 1, "view", 0.0),
        (4, _ts(9), 3, "view", 0.0),
    ]
    out = cohort_retention(_events(spark, rows), "user_id", "ts", "2024-01-01")
    got = {(r["cohort_week"], r["week_offset"]): r.asDict() for r in out.collect()}
    assert got[(0, 0)]["n_active"] == 2 and got[(0, 0)]["cohort_size"] == 2
    assert got[(0, 0)]["retention_e4"] == 10000
    assert got[(0, 1)]["n_active"] == 1
    assert got[(0, 1)]["retention_e4"] == 5000
    assert got[(1, 0)]["n_active"] == 1 and got[(1, 0)]["cohort_size"] == 1


def test_markov_transitions_row_normalized(spark):
    from bioeco_portal_etl_spark.operators.transitions import (
        markov_transitions,
    )

    rows = [
        (1, _ts(1, 1), 1, "a", 0.0),
        (2, _ts(1, 2), 1, "b", 0.0),
        (3, _ts(1, 3), 1, "a", 0.0),
        (4, _ts(1, 4), 1, "c", 0.0),
        # user 2 contributes a->b; final event has no successor
        (5, _ts(2, 1), 2, "a", 0.0),
        (6, _ts(2, 2), 2, "b", 0.0),
    ]
    out = markov_transitions(
        _events(spark, rows), "user_id", "ts", "event_type", "event_id"
    )
    got = {(r["src"], r["dst"]): (r["cnt"], r["p_e4"]) for r in out.collect()}
    # a -> b twice, a -> c once; b -> a once (user 1 only)
    assert got[("a", "b")] == (2, 6666)
    assert got[("a", "c")] == (1, 3333)
    assert got[("b", "a")] == (1, 10000)
    assert sum(c for c, _ in got.values()) == 4


def test_markov_transitions_no_cross_user_pairs(spark):
    from bioeco_portal_etl_spark.operators.transitions import (
        markov_transitions,
    )

    rows = [
        (1, _ts(1, 1), 1, "a", 0.0),
        (2, _ts(1, 2), 2, "b", 0.0),  # different user, later ts: no a->b
    ]
    out = markov_transitions(
        _events(spark, rows), "user_id", "ts", "event_type", "event_id"
    )
    assert out.count() == 0
