"""Unit semantics for containment dedupe, group z-score normalization,
and degree histogram on hand-built frames; the catalog oracle re-checks
the same ops at sf0.001/0.01."""

from __future__ import annotations


def test_containment_catches_subset_that_jaccard_misses(spark):
    from bioeco_portal_etl_spark.text.dedupe import containment_pairs

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    out = containment_pairs(df, "doc_id", "text", threshold=0.8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # every shingle of the small doc appears in the big one
    assert r["cont_a_e4"] == 10000
    # jaccard is low: the pair would MISS a 0.5 jaccard threshold
    assert r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"]) < 0.1


def test_containment_stop_shingles_block_nothing(spark):
    from bioeco_portal_etl_spark.text.dedupe import containment_pairs

    # 30 docs all sharing ONE common shingle (df=30 > max_df=20): the
    # shared shingle is a stop-shingle, so no candidates -> no pairs.
    rows = [(i, f"common shingle here unique{i} tail{i} end{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(df, "doc_id", "text", threshold=0.1, max_df=20)
    assert out.count() == 0


def test_group_zscore_moments_and_null_variance(spark):
    from bioeco_portal_etl_spark.operators.stats import group_zscore

    rows = [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = group_zscore(df, "g", "v").collect()
    a = sorted([r["z_e4"] for r in out if r["g"] == "a"])
    # group a: values 100, 300 cents; mean 200, std 100 -> z = ±1
    assert a == [-10000, 10000]
    # group b: zero variance -> null z
    assert all(r["z_e4"] is None for r in out if r["g"] == "b")


def test_degree_histogram_buckets(spark):
    from bioeco_portal_etl_spark.graph.degrees import degree_histogram

    # node 1 -> degree 1 (bucket 0); node 2 -> degree 3 (bucket 1);
    # node 3 -> degree 4 (bucket 2); duplicate edges collapse
    edges = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10), (2, 11), (2, 12)]
        + [(3, 10), (3, 11), (3, 12), (3, 13)],
        "src long, dst long",
    )
    out = {r["bucket"]: r.asDict() for r in degree_histogram(edges).collect()}
    assert out[0]["n_nodes"] == 1 and out[0]["max_degree"] == 1
    assert out[1]["n_nodes"] == 1 and out[1]["min_degree"] == 3
    assert out[2]["n_nodes"] == 1 and out[2]["min_degree"] == 4
