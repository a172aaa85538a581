"""Unit semantics for the corpus-statistics operators (token entropy, PMI
collocations, postings summary) on hand-built documents; the catalog
oracle re-checks the same ops at sf0.001/0.01."""

from __future__ import annotations

import math


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_entropy_uniform_vs_degenerate(spark):
    from bioeco_portal_etl_spark.text.analysis import token_entropy_table

    rows = [
        (1, "a b c d"),  # uniform over 4 types: entropy = ln 4
        (2, "a a a a"),  # degenerate: entropy = 0
        (3, ""),  # no tokens: dropped
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in token_entropy_table(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_tokens"] == 4 and out[1]["n_types"] == 4
    # 4 terms, each floor(1e4 * 0.25 * ln 4); ln 4 ~ 1.3862943
    assert out[1]["entropy_e4"] == 4 * math.floor(2500 * math.log(4.0) / 1000 * 1000)
    assert out[2]["n_types"] == 1 and out[2]["entropy_e4"] == 0


def test_pmi_prefers_exclusive_pairs(spark):
    from bioeco_portal_etl_spark.text.analysis import pmi_bigrams

    # "x y" always co-occur exclusively (PMI max); "a b" share marginals
    # with many other pairs (lower PMI).
    rows = [(i, "x y") for i in range(5)] + [
        (100 + i, "a b a c a d a b") for i in range(5)
    ]
    out = pmi_bigrams(_docs(spark, rows), "text", min_count=5, top_k=10).collect()
    assert out[0]["w1"] == "x" and out[0]["w2"] == "y"
    top = {(r["w1"], r["w2"]): r["pmi_e4"] for r in out}
    assert top[("x", "y")] > top[("a", "b")]


def test_postings_top_doc_and_min_df(spark):
    from bioeco_portal_etl_spark.text.analysis import postings_table

    rows = [
        (1, "cat cat cat dog"),
        (2, "cat dog dog"),
        (3, "cat"),
    ]
    out = {
        r["token"]: r.asDict()
        for r in postings_table(_docs(spark, rows), "doc_id", "text", min_df=2).collect()
    }
    assert out["cat"]["df_docs"] == 3 and out["cat"]["tf_total"] == 5
    assert out["cat"]["top_doc"] == 1  # tf 3 beats tf 1
    assert out["dog"]["df_docs"] == 2 and out["dog"]["top_doc"] == 2
    # min_df honored: nothing with df 1 could appear (none here anyway)
    assert set(out) == {"cat", "dog"}


def test_postings_tf_tie_breaks_to_lowest_doc(spark):
    from bioeco_portal_etl_spark.text.analysis import postings_table

    rows = [(2, "z z"), (1, "z z"), (3, "z")]
    out = postings_table(_docs(spark, rows), "doc_id", "text", min_df=1).collect()
    assert len(out) == 1 and out[0]["top_doc"] == 1
