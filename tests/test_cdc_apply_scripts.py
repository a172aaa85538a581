"""Unit semantics for CDC apply (the diff/apply round-trip law) and
Unicode script detection on hand-built frames."""

from __future__ import annotations


def test_apply_changeset_round_trip_law(spark):
    from bioeco_portal_etl_spark.operators.cdc import (
        apply_changeset,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)],
        "id long, name string, bal double",
    )
    cs = snapshot_diff(old, new, ["id"], ["name", "bal"])
    applied = apply_changeset(old, cs, ["id"], ["name", "bal"])
    got = sorted((r["id"], r["name"], r["bal"]) for r in applied.collect())
    want = sorted((r["id"], r["name"], r["bal"]) for r in new.collect())
    assert got == want  # apply(old, diff(old, new)) == new


def test_apply_changeset_delete_only(spark):
    from bioeco_portal_etl_spark.operators.cdc import apply_changeset

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    cs = spark.createDataFrame(
        [(2, "delete", "", None)],
        "id long, change_type string, changed_cols string, name string",
    )
    out = apply_changeset(snap, cs, ["id"], ["name"]).collect()
    assert [(r["id"], r["name"]) for r in out] == [(1, "a")]


def test_script_profile_dominant_and_ties(spark):
    from bioeco_portal_etl_spark.text.analysis import script_profile

    df = spark.createDataFrame(
        [
            (1, "Hello world"),  # latin
            (2, "привет мир"),  # cyrillic
            (3, "世界你好"),  # cjk
            (4, "hi мир"),  # tie 2-2? 'hi'=2 latin, 'мир'=3 cyr -> cyrillic
            (5, "ab мир"),  # 2 latin vs 3 cyr -> cyrillic
            (6, "abc мир"),  # 3 vs 3 tie -> latin (earlier in order)
            (7, "12345 !!!"),  # nothing -> none
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in script_profile(df, "doc_id", "text").collect()}
    assert out[1]["script"] == "latin"
    assert out[2]["script"] == "cyrillic" and out[2]["n_cyrillic"] == 9
    assert out[3]["script"] == "cjk" and out[3]["n_cjk"] == 4
    assert out[4]["script"] == "cyrillic"
    assert out[6]["n_latin"] == 3 and out[6]["n_cyrillic"] == 3
    assert out[6]["script"] == "latin"  # tie breaks to earlier range
    assert out[7]["script"] == "none"
