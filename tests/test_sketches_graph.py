"""Round-4 operators: sketches (KMV/CMS/HLL/Bloom), graph (PageRank /
triangles), robust stats, islands, priority sampling, rolling z-score.

The catalog oracle test already pins cross-engine exactness; these pin the
SEMANTIC guarantees (error bounds, one-sidedness, no-false-negatives,
conservation) and the plan shapes that make each safe at 100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark import catalog
from tests.conftest import SF_SMOKE


def _physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    from bioeco_portal_etl_spark.sketches.kmv import kmv_distinct

    # 10 distinct < k: sketch must be exact
    small = spark.range(100).select((F.col("id") % 10).alias("v"), F.lit("g").alias("g"))
    [row] = kmv_distinct(small, ["g"], "v", k=64).collect()
    assert row["est_distinct"] == 10
    # 5000 distinct >> k=256: relative error within 5/sqrt(k-2)
    big = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    [row] = kmv_distinct(big, ["g"], "v", k=256).collect()
    assert abs(row["est_distinct"] - 5000) / 5000 < 5 / (254**0.5)


def test_cms_overestimates_never_under(spark):
    rows = catalog.queries()["sk2_cms_heavy_hitters"](spark, SF_SMOKE).collect()
    assert rows and all(r["est_cnt"] >= r["true_cnt"] for r in rows)


def test_cms_grid_is_broadcast_and_build_combines_map_side(spark):
    df = catalog.queries()["sk2_cms_heavy_hitters"](spark, SF_SMOKE)
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan  # grid join never shuffles the keys
    assert "partial_count" in plan  # grid build pre-combines map-side


def test_hll_error_within_3_sigma(spark):
    rows = catalog.queries()["sk3_hll_distinct"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # raw HLL, m=64 -> sigma ~ 1.04/8 = 13%; allow 3 sigma
        assert abs(r["est_distinct"] - r["true_distinct"]) <= 0.4 * r["true_distinct"] + 2


def test_bloom_no_false_negatives(spark):
    rows = catalog.queries()["sk4_bloom_gate"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r["possibly_seen"] for r in rows if r["actually_seen"])


def test_bloom_word_table_is_bounded_and_broadcast(spark):
    from bioeco_portal_etl_spark.sketches.bloom_md5 import WORD_BITS, bloom_build_md5

    docs = spark.range(200).select(F.col("id").cast("string").alias("t"))
    bloom = bloom_build_md5(docs, "t", m_bits=8192, k=3)
    assert bloom.count() <= 8192 // WORD_BITS + 1
    plan = _physical(catalog.queries()["sk4_bloom_gate"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# graph
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_uniform_on_symmetric_regular_graph(spark):
    from bioeco_portal_etl_spark.graph.pagerank import pagerank

    # 4-cycle, symmetric: every node must hold the same rank
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 0), (0, 3)]
    ranks = pagerank(_edges(spark, pairs), iterations=3, persist_edges=False).collect()
    vals = {r["pr_e9"] for r in ranks}
    assert len(vals) == 1 and len(ranks) == 4
    # total mass stays ~1.0 (truncation loses < 1e-9 * E * iters)
    assert abs(sum(r["pr_e9"] for r in ranks) - 1_000_000_000) < 100


def test_pagerank_hub_outranks_leaves(spark):
    from bioeco_portal_etl_spark.graph.pagerank import pagerank

    # star: leaves 1..5 <-> hub 0
    pairs = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = {
        r["node"]: r["pr_e9"]
        for r in pagerank(_edges(spark, pairs), iterations=3, persist_edges=False).collect()
    }
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0)


def test_triangles_known_graph(spark):
    from bioeco_portal_etl_spark.graph.triangles import triangle_stats

    # K4 has 4 triangles, 6 edges; add a pendant edge (4-5): still 4
    pairs = [(a, b) for a in range(4) for b in range(4) if a != b] + [(4, 5)]
    [row] = triangle_stats(_edges(spark, pairs)).collect()
    assert row["n_nodes"] == 6
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4


def test_triangles_no_false_positives_on_tree(spark):
    from bioeco_portal_etl_spark.graph.triangles import triangle_stats

    pairs = [(0, 1), (1, 2), (2, 3), (1, 4)]
    [row] = triangle_stats(_edges(spark, pairs)).collect()
    assert row["n_triangles"] == 0


# ---------------------------------------------------------------------------
# robust stats / islands / sampling / z-score
# ---------------------------------------------------------------------------


def test_median_mad_known_values(spark):
    from bioeco_portal_etl_spark.operators.robust import median_mad

    df = spark.createDataFrame(
        [("g", float(v), i) for i, v in enumerate([1, 2, 3, 4, 100])],
        "g string, v double, id long",
    )
    [row] = median_mad(df, ["g"], "v", "id").collect()
    assert row["median"] == 3.0  # robust to the 100 outlier
    assert row["mad"] == 1.0  # devs: 2,1,0,1,97 -> lower median 1
    assert row["n"] == 5


def test_islands_splits_on_value_change_not_time(spark):
    from bioeco_portal_etl_spark.operators.islands import islands

    rows = [
        (1, "a", 1, 10),
        (1, "a", 2, 11),
        (1, "b", 3, 12),
        (1, "a", 4, 13),
        (2, "a", 1, 14),
    ]
    df = spark.createDataFrame(rows, "user long, typ string, t long, id long")
    out = {
        (r["user"], r["typ"], r["run_start"]): r["n_rows"]
        for r in islands(df, ["user"], "typ", ["t", "id"]).collect()
    }
    assert out == {(1, "a", 1): 2, (1, "b", 3): 1, (1, "a", 4): 1, (2, "a", 1): 1}


def test_priority_sample_respects_weights(spark):
    from bioeco_portal_etl_spark.operators.sampling import priority_sample

    # 500 light (w=1) + 500 heavy (w=100) docs: a 50-doc sample should be
    # dominated by heavy docs (expected heavy share ~ 100/101)
    df = spark.range(1000).select(
        F.col("id"),
        F.lit("g").alias("g"),
        F.when(F.col("id") < 500, 1).otherwise(100).alias("w"),
    )
    picked = priority_sample(df, "g", "id", "w", k=50).collect()
    heavy = sum(1 for r in picked if r["id"] >= 500)
    assert len(picked) == 50 and heavy >= 45


def test_rolling_zscore_flags_planted_outlier(spark):
    from bioeco_portal_etl_spark.operators.timeseries import rolling_zscore

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.0, 500.0, 10.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "user long, t long, v double"
    )
    out = rolling_zscore(df, ["user"], ["t"], "v", window_rows=10, min_rows=5)
    flagged = [r["t"] for r in out.filter(F.col("is_anomaly")).collect()]
    assert flagged == [7]  # only the planted 500.0 spike


def test_new_ops_have_no_python_udfs(spark):
    """Every round-4 catalog query stays JVM-side (no BatchEvalPython /
    ArrowEvalPython stages)."""
    for name in [
        "sk1_kmv_distinct", "sk2_cms_heavy_hitters", "sk3_hll_distinct",
        "sk4_bloom_gate", "gr1_pagerank", "gr2_triangles",
        "rel16_median_mad", "rel17_islands", "x12_weighted_sample",
        "x13_rolling_zscore", "tx12_vocab_growth",
    ]:
        plan = _physical(catalog.queries()[name](spark, SF_SMOKE))
        assert "EvalPython" not in plan, name
