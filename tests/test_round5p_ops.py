"""Operator-level tests for the round-5 sixteenth batch: effective
diameter cutoff, A/B z-test (known-answer + degenerate guard), Zipf fit
on a synthetic power law, top-k diversity (clone set vs spread set), and
the expectations suite (pass/fail accounting + NULL-as-fail)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_effective_diameter_path_graph(spark):
    """Path a-b-c at radius 2: N(0) = 3, N(1) = 7, N(2) = 9 (exact here
    — collision-free ids per the gr11 test). 90% of 9 is 8.1, so the
    effective diameter is 2; the coverage curve is auditable."""
    from bioeco_portal_etl_spark.graph.hyperball import (
        effective_diameter,
        hyperball_neighborhood,
    )

    a, b, c = 101, 202, 303
    fwd = spark.createDataFrame([(a, b), (b, c)], "src long, dst long")
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = spark.createDataFrame([(a,), (b,), (c,)], "node long")
    hb = hyperball_neighborhood(edges, nodes, radius=2)
    row = effective_diameter(hb, radius=2).collect()[0]
    assert row["eff_diameter"] == 2
    assert row["coverage_e6_r0"] == 1_000_000 * 3 // 9
    assert row["coverage_e6_r1"] == 1_000_000 * 7 // 9
    assert row["coverage_e6_r2"] == 1_000_000


def test_ab_test_known_z(spark):
    """200 vs 200 users, 60% vs 45% conversion: z = 3.0093... ->
    z_e4 = 30093 (recomputed inline), significant = 1."""
    from bioeco_portal_etl_spark.operators.abtest import ab_test_report

    rows = [("A", 1 if i < 120 else 0) for i in range(200)]
    rows += [("B", 1 if i < 90 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "variant string, converted long")
    out = ab_test_report(df, "variant", "converted").collect()[0]
    p = (120 + 90) / 400
    se = math.sqrt(p * (1 - p) * (1 / 200 + 1 / 200))
    z_e4 = math.floor((0.6 - 0.45) / se * 10000)
    assert out["rate_a_e6"] == 600_000 and out["rate_b_e6"] == 450_000
    assert out["lift_e6"] == 150_000
    assert out["z_e4"] == z_e4 and out["significant"] == 1


def test_ab_test_degenerate_not_significant(spark):
    """Both variants fully convert: se = 0, z undefined (NULL) — the
    verdict must be 0, never NULL."""
    from bioeco_portal_etl_spark.operators.abtest import ab_test_report

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 1)], "variant string, converted long"
    )
    out = ab_test_report(df, "variant", "converted").collect()[0]
    assert out["z_e4"] is None and out["significant"] == 0


def test_zipf_fit_exact_power_law(spark):
    """A corpus built so term t_r appears exactly floor(1000/r) times
    (r = 1..20) has a log-log slope near -1; with e4-quantized logs the
    OLS slope lands within a few permille of -1e6."""
    from bioeco_portal_etl_spark.text.zipf import zipf_fit

    words = []
    for r in range(1, 21):
        words += [f"term{r:02d}"] * (1000 // r)
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    out = zipf_fit(docs, "text", top_k=20).collect()[0]
    assert out["n_terms"] == 20
    assert out["top1_share_e6"] == 1_000_000 * 1000 // out["n_tokens"]
    assert -1_020_000 < out["slope_e6"] < -980_000


def test_topk_diversity_clones_vs_spread(spark):
    """A corpus of near-identical vectors yields mean pair similarity
    ~1e4; an orthogonal corpus yields ~0 — the metric separates the two
    result-set shapes retrieval scores alone cannot."""
    from bioeco_portal_etl_spark.similarity.knn import topk_diversity
    from bioeco_portal_etl_spark.similarity.sq import DIM

    def vec(i, spread):
        v = [0.0] * DIM
        if spread:
            v[i % DIM] = 1.0
        else:
            v[0], v[1 + (i % 4)] = 1.0, 0.001 * (i % 7)
        return v

    clones = spark.createDataFrame(
        [(i, vec(i, False)) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    spread = spark.createDataFrame(
        [(i, vec(i, True)) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    q = lambda df: df.filter(F.col("vec_id") < 2)
    c_out = topk_diversity(clones, q(clones), "embedding", "vec_id", k=4).collect()
    s_out = topk_diversity(spread, q(spread), "embedding", "vec_id", k=4).collect()
    assert all(r["n_pairs"] == 6 for r in c_out + s_out)
    assert min(r["mean_pair_sim_e4"] for r in c_out) > 9900
    assert max(r["mean_pair_sim_e4"] for r in s_out) <= 0


def test_expectation_suite_accounting_and_null_fail(spark):
    """n_pass + n_fail = n_rows for every rule; a NULL predicate result
    (NULL value in a comparison) counts as a FAILURE."""
    from bioeco_portal_etl_spark.operators.quality import expectation_suite

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -5)], "id long, v long"
    )
    out = {
        r["check"]: (r["n_rows"], r["n_pass"], r["n_fail"], r["pass_e6"])
        for r in expectation_suite(
            df,
            [
                ("v_positive", F.col("v") > 0),
                ("id_present", F.col("id").isNotNull()),
            ],
        ).collect()
    }
    assert out["v_positive"] == (3, 1, 2, 333_333)  # NULL v -> fail
    assert out["id_present"] == (3, 3, 0, 1_000_000)
    import pytest

    with pytest.raises(ValueError):
        expectation_suite(df, [("bad name!", F.col("v") > 0)])


def _ansi(spark):
    """Context helper: run a block under ANSI-on (Spark 4's DEFAULT
    session posture, which the external driver uses)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prev)

    return ctx()


def test_ab_test_absent_variant_ansi_safe(spark):
    """A variant with ZERO rows (here: nobody in B) must surface NULL
    rates/z and significant = 0 — not an ANSI DIVIDE_BY_ZERO or an
    invalid NaN->long cast (ADVICE r5 #3)."""
    from bioeco_portal_etl_spark.operators.abtest import ab_test_report

    df = spark.createDataFrame(
        [("A", 1), ("A", 0)], "variant string, converted long"
    )
    with _ansi(spark):
        out = ab_test_report(df, "variant", "converted").collect()[0]
    assert out["n_a"] == 2 and out["n_b"] == 0
    assert out["rate_a_e6"] == 500_000
    assert out["rate_b_e6"] is None and out["lift_e6"] is None
    assert out["z_e4"] is None and out["significant"] == 0


def test_ab_test_empty_input_ansi_safe(spark):
    from bioeco_portal_etl_spark.operators.abtest import ab_test_report

    df = spark.createDataFrame([], "variant string, converted long")
    with _ansi(spark):
        out = ab_test_report(df, "variant", "converted").collect()[0]
    assert out["rate_a_e6"] is None and out["z_e4"] is None
    assert out["significant"] == 0


def test_expectation_suite_empty_input_ansi_safe(spark):
    """Empty input: (0, 0, 0, NULL) per rule — the div-by-zero guard of
    ADVICE r5 #3, exercised under the ANSI default session."""
    from bioeco_portal_etl_spark.operators.quality import expectation_suite

    df = spark.createDataFrame([], "id long, v long")
    with _ansi(spark):
        rows = expectation_suite(
            df, [("v_positive", F.col("v") > 0)]
        ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_rows"], r["n_pass"], r["n_fail"], r["pass_e6"]) == (
        0,
        0,
        0,
        None,
    )
