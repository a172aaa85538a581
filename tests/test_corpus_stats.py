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


def test_boilerplate_coverage_flags_template(spark):
    from bioeco_portal_etl_spark.text.analysis import boilerplate_coverage

    template = "all rights reserved contact us today"
    rows = [(i, f"{template} unique{i} body{i} text{i}") for i in range(5)]
    rows.append((99, "completely original document body here"))
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_coverage(df, "doc_id", "text", min_docs=3).collect()
    }
    # the template's shingles appear in 5 docs (> 3): flagged as boiler
    assert out[0]["n_boiler"] >= 4
    assert out[0]["coverage_e4"] > 0
    assert out[99]["n_boiler"] == 0 and out[99]["coverage_e4"] == 0


def test_node_jaccard_hub_guard_and_score(spark):
    from bioeco_portal_etl_spark.graph.similarity import node_jaccard

    # customers 1,2 share items 10,11; item 99 is a hub everyone buys
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99), (2, 10), (2, 11), (2, 99), (3, 99), (4, 99)],
        "src long, dst long",
    )
    out = node_jaccard(edges, min_common=2, max_item_degree=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == (1, 2)
    # common counted over NON-hub items only (99 pruned): 2 of union 4
    assert r["n_common"] == 2 and r["deg_a"] == 3 and r["deg_b"] == 3
    assert r["jaccard_e4"] == 5000
