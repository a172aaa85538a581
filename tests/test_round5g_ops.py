"""Operator-level tests for the round-5 seventh batch: HITS vs a pure-
Python reference, RAKE vs hand-scored fixtures, radius-search set
semantics, filtered-ANN restriction, and changelog net-effect rules."""

from __future__ import annotations

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# HITS vs pure-Python reference
# ---------------------------------------------------------------------------


def _hits_ref(edges, iterations):
    import math

    edges = sorted(set(edges))
    srcs = sorted({s for s, _ in edges})
    h = {s: 1_000_000 for s in srcs}
    a = {}
    for _ in range(iterations):
        a_raw = {}
        for s, d in edges:
            a_raw[d] = a_raw.get(d, 0) + h[s]
        m = max(a_raw.values())
        a = {d: math.floor(1e6 * v / m) for d, v in a_raw.items()}
        h_raw = {}
        for s, d in edges:
            h_raw[s] = h_raw.get(s, 0) + a[d]
        m = max(h_raw.values())
        h = {s: math.floor(1e6 * v / m) for s, v in h_raw.items()}
    return h, a


def test_hits_matches_reference_bipartite(spark):
    from bioeco_portal_etl_spark.graph.hits import hits

    # customers 1..4 -> suppliers 10..12; customer 1 buys everywhere,
    # supplier 10 sells to everyone
    edges = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (3, 10), (4, 10),
        (2, 11), (3, 12),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got_h = {}
    got_a = {}
    for r in hits(e, iterations=2).collect():
        (got_h if r["side"] == "hub" else got_a)[r["node"]] = r["score_e6"]
    ref_h, ref_a = _hits_ref(edges, 2)
    assert got_h == ref_h and got_a == ref_a
    # the structural expectations: customer 1 is the best hub, supplier
    # 10 the best authority (max-normalized to exactly 1e6)
    assert got_h[1] == 1_000_000 and got_a[10] == 1_000_000
    assert max(got_h, key=got_h.get) == 1
    assert max(got_a, key=got_a.get) == 10


# ---------------------------------------------------------------------------
# RAKE
# ---------------------------------------------------------------------------


def test_rake_phrase_segmentation_and_scores(spark):
    from bioeco_portal_etl_spark.text.rake import rake_keywords

    # stopword 'the' splits one candidate run into two phrases
    docs = spark.createDataFrame(
        [(1, "red apple the green pear")], "doc_id long, text string"
    )
    out = {
        r["phrase"]: (r["n_words"], r["score_e4"], r["rank"])
        for r in rake_keywords(docs, "doc_id", "text", ["the"], top_k=5)
        .collect()
    }
    # every word occurs once in one 2-word phrase: deg=2, freq=1 ->
    # word score 20000; phrase score = 40000 for both phrases
    assert out == {
        "green pear": (2, 40_000, 1),  # tie -> phrase-string order
        "red apple": (2, 40_000, 2),
    }


def test_rake_prefers_longer_phrases(spark):
    from bioeco_portal_etl_spark.text.rake import rake_keywords

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma the alpha the beta")],
        "doc_id long, text string",
    )
    rows = rake_keywords(docs, "doc_id", "text", ["the"], top_k=1).collect()
    assert rows[0]["phrase"] == "alpha beta gamma"  # highest summed degree


# ---------------------------------------------------------------------------
# radius search and filtered ANN
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_range_search_is_threshold_set(spark):
    from bioeco_portal_etl_spark.similarity.knn import cosine_range_search

    base = [0.0] * 62
    rows = [
        (0, [1.0, 0.0] + base, 0),
        (1, [1.0, 0.1] + base, 0),   # cos ~0.995
        (2, [0.0, 1.0] + base, 0),   # cos 0
        (3, [-1.0, 0.0] + base, 0),  # cos -1
    ]
    out = cosine_range_search(
        _vecs(spark, rows),
        _vecs(spark, rows).filter(F.col("vec_id") == 0),
        "embedding",
        "vec_id",
        threshold_e4=5000,
    ).collect()
    assert {r["match_id"] for r in out} == {1}
    assert all(r["score_e4"] >= 5000 for r in out)


def test_filtered_ann_never_scores_excluded_labels(spark):
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk

    base = [0.0] * 62
    rows = [
        (0, [1.0, 0.0] + base, 1),
        (1, [1.0, 0.01] + base, 2),  # nearest overall but wrong label
        (2, [0.5, 0.5] + base, 1),
        (3, [0.9, 0.1] + base, 1),
    ]
    df = _vecs(spark, rows)
    out = cosine_topk(
        df.filter(F.col("label") == 1),
        df.filter(F.col("vec_id") == 0),
        "embedding",
        "vec_id",
        k=2,
    ).collect()
    assert [r["match_id"] for r in out] == [3, 2]  # vec 1 filtered away


# ---------------------------------------------------------------------------
# changelog net effect
# ---------------------------------------------------------------------------


def test_net_effect_rules(spark):
    from bioeco_portal_etl_spark.operators.cdc import net_effect

    ops = [
        # key 1: I..U -> net I with final value
        (1, 1, "I", 10), (1, 2, "U", 20),
        # key 2: I..D -> NONE
        (2, 1, "I", 10), (2, 2, "D", None),
        # key 3: U..D -> D
        (3, 1, "U", 5), (3, 2, "D", None),
        # key 4: lone U -> U
        (4, 1, "U", 7),
        # key 5: D then I -> existed before, ends existing -> U
        (5, 1, "D", None), (5, 2, "I", 9),
    ]
    df = spark.createDataFrame(ops, "k long, seq long, op string, v long")
    got = {
        r["key"]: (r["n_ops"], r["net_op"], r["net_value"])
        for r in net_effect(df, "k", "seq", "op", "v").collect()
    }
    assert got[1] == (2, "I", 20)
    assert got[2] == (2, "NONE", None)
    assert got[3] == (2, "D", None)
    assert got[4] == (1, "U", 7)
    assert got[5] == (2, "U", 9)
