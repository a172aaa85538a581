"""Unit semantics for the round-5 operators — connected components,
split-leakage audit, incremental aggregate maintenance — on hand-built
inputs where the expected output is computable by eye; the catalog oracle
re-checks the same ops statistically at sf0.001/0.01."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cc_chain_triangle_star(spark):
    """Multi-hop chain, cycle, star, isolated self-loop — component id is
    always the min reachable node."""
    from bioeco_portal_etl_spark.graph.cc import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain: depth > 1 (pointer jumps)
        (10, 11), (11, 12), (12, 10),    # cycle
        (20, 21),                        # pair
        (30, 30),                        # self-loop only -> excluded
        (40, 41), (40, 42), (43, 41),    # star merged via shared node
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        40: 40, 41: 40, 42: 40, 43: 40,
    }


def test_cc_two_stars_bridged(spark):
    """The dedup use case: two hash-group stars sharing one member must
    merge into a single cluster (transitive evidence)."""
    from bioeco_portal_etl_spark.graph.cc import connected_components

    df = spark.createDataFrame(
        [(1, 5), (1, 9), (2, 9), (2, 7)], "src long, dst long"
    )
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert set(got.values()) == {1}
    assert set(got) == {1, 2, 5, 7, 9}


def test_cc_matches_duck_oracle_on_random_graph(spark):
    """Cross-engine agreement on a pseudo-random 200-edge graph (keyed off
    a fixed arithmetic generator, no RNG)."""
    import duckdb

    from bioeco_portal_etl_spark.graph.cc import (
        connected_components,
        duck_connected_components,
    )

    edges = [((i * 37) % 60, (i * 53 + 11) % 60) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = (
        "WITH RECURSIVE "
        + duck_connected_components("SELECT src, dst FROM e")
        + " SELECT node, component FROM cc"
    )
    assert got == dict(con.execute(sql).fetchall())


def test_cc_empty_edges(spark):
    from bioeco_portal_etl_spark.graph.cc import connected_components

    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_split_leakage_counts(spark):
    from bioeco_portal_etl_spark.operators.leakage import split_leakage

    rows = [
        (1, "aaa", "train"),
        (2, "aaa", "val"),     # leaked both ways
        (3, "bbb", "train"),
        (4, "bbb", "train"),   # duplicated but train-only -> not leaked
        (5, "ccc", "val"),     # unique -> not leaked
        (6, "aaa", "val"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    out = split_leakage(df, "doc_id", "text", "split").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_train, r.n_eval, r.min_doc) == (3, 1, 2, 1)


def test_split_leakage_clean_corpus_is_empty(spark):
    from bioeco_portal_etl_spark.operators.leakage import split_leakage

    df = spark.createDataFrame(
        [(1, "x", "train"), (2, "y", "val")],
        "doc_id long, text string, split string",
    )
    assert split_leakage(df, "doc_id", "text", "split").count() == 0


def _rows_eq(a, b):
    key = lambda r: tuple(str(x) for x in r)  # noqa: E731
    return sorted((tuple(r) for r in a), key=key) == sorted(
        (tuple(r) for r in b), key=key
    )


def test_incremental_merge_equals_recompute(spark):
    """merge(partial(base), partial(delta)) == partial(base ∪ delta),
    including groups only in the delta, only in the base, and null values."""
    from bioeco_portal_etl_spark.operators.incremental import (
        merge_aggs,
        partial_agg,
    )

    base_rows = [("a", 1.5), ("a", 2.5), ("b", 10.0), ("b", None)]
    delta_rows = [("a", -3.0), ("c", 7.25)]
    schema = "k string, v double"
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    merged = merge_aggs(
        partial_agg(base, ["k"], "v"), partial_agg(delta, ["k"], "v"), ["k"]
    )
    recomputed = partial_agg(base.unionByName(delta), ["k"], "v")
    assert _rows_eq(merged.collect(), recomputed.collect())
    got = {r.k: r for r in merged.collect()}
    assert got["a"].n_rows == 3 and float(got["a"].sum_val) == 1.0
    assert float(got["a"].min_val) == -3.0 and float(got["a"].max_val) == 2.5
    assert got["b"].n_rows == 2 and float(got["b"].sum_val) == 10.0
    assert got["c"].n_rows == 1 and float(got["c"].min_val) == 7.25


def test_incremental_merge_is_exact_on_money(spark):
    """DECIMAL state: merged sum is bit-exact vs recompute even for values
    whose double sums would reassociate (0.1-style fractions)."""
    from bioeco_portal_etl_spark.operators.incremental import (
        merge_aggs,
        partial_agg,
    )

    base = spark.createDataFrame(
        [("g", 0.1)] * 7 + [("g", 123456789.01)], "k string, v double"
    )
    delta = spark.createDataFrame([("g", 0.2)] * 3, "k string, v double")
    m = merge_aggs(
        partial_agg(base, ["k"], "v"), partial_agg(delta, ["k"], "v"), ["k"]
    ).first()
    r = partial_agg(base.unionByName(delta), ["k"], "v").first()
    assert m.sum_val == r.sum_val  # Decimal equality, no ulp slack


def test_synth_png_roundtrip_stats(spark):
    """The mm6 pipeline stages on a tiny id set: stats computed through the
    REAL PNG round-trip equal the direct formula."""
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
        png_channel_stats,
        synth_rgb_png,
    )

    ids = spark.createDataFrame([(0,), (7,), (13,)], "doc_id long")
    out = png_channel_stats(synth_rgb_png(ids, "doc_id")).collect()
    assert len(out) == 9  # 3 ids x 3 channels
    for r in out:
        mid, c = r.media_id, r.channel
        w = SYNTH_W_BASE + mid % SYNTH_W_MOD
        h = SYNTH_H_BASE + mid % SYNTH_H_MOD
        vals = [
            (mid * 7 + x * 3 + y * 5 + c * 11) % 256
            for x in range(w)
            for y in range(h)
        ]
        assert r.n_px == w * h
        assert r.mean_v == sum(vals) // len(vals)
        assert r.min_v == min(vals) and r.max_v == max(vals)
