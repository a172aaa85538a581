"""Operator-level tests for the round-5 tenth batch: HLL register merge
losslessness, n-gram coverage counting, IVF cell stats (incl. empty
cells), and the join-skew report."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hll_merge_equals_direct(spark):
    """Pointwise-max register merge must be LOSSLESS: merging per-day
    sketches gives byte-identical registers — hence identical estimates —
    to sketching the coarser group directly."""
    from bioeco_portal_etl_spark.sketches.hll import (
        hll_estimate,
        hll_registers,
        merge_registers,
    )

    rows = [(d, u) for d in range(6) for u in range(d * 40, d * 40 + 120)]
    df = spark.createDataFrame(rows, "d long, u long")
    day = hll_registers(df, ["d"], "u")
    merged = hll_estimate(
        merge_registers(day.withColumn("g", F.col("d") % 2), ["g"]), ["g"]
    )
    direct = hll_estimate(
        hll_registers(df.withColumn("g", F.col("d") % 2), ["g"], "u"), ["g"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # sanity: estimates are in HLL error range of the truth (~13% stderr)
    est = {r["g"]: r["est_distinct"] for r in direct.collect()}
    truth = {r["g"]: r["t"] for r in
             df.withColumn("g", F.col("d") % 2)
               .groupBy("g").agg(F.count_distinct("u").alias("t")).collect()}
    for g in truth:
        assert abs(est[g] - truth[g]) / truth[g] < 0.5


def test_ngram_coverage_counts(spark):
    from bioeco_portal_etl_spark.text.ngram_coverage import ngram_coverage

    rows = [
        (1, "a b c d e"),      # shares gram "a b c" with doc 2
        (2, "a b c x y"),
        (3, "p q r s t"),      # unique -> coverage 0
        (4, "ab"),             # < k tokens -> no grams, coverage 0
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in ngram_coverage(d, "doc_id", "text", k=3, min_df=2).collect()}
    # "a b c" starts at 0 in both docs -> covers positions 0,1,2 of 5
    assert got[1]["covered"] == 3 and got[1]["coverage_e6"] == 600_000
    assert got[2]["covered"] == 3
    assert got[3]["covered"] == 0 and got[3]["coverage_e6"] == 0
    assert got[4]["n_tokens"] == 1 and got[4]["covered"] == 0


def test_ivf_cell_stats_includes_empty_cells(spark):
    from bioeco_portal_etl_spark.similarity.ivf import ivf_cell_stats

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (10, [0.9, 0.1]),   # -> cell 0
        (11, [0.8, 0.2]),   # -> cell 0
        (12, [0.1, 0.9]),   # -> cell 1
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = d.filter(F.col("vec_id") < 2).unionByName(
        spark.createDataFrame([(2, [-1.0, 0.0])],
                              "vec_id long, embedding array<float>")
    )
    got = {r["cell_id"]: r.asDict()
           for r in ivf_cell_stats(d, cents, "embedding", "vec_id").collect()}
    assert got[0]["n_vecs"] == 3  # vec 0 itself + 10, 11
    assert got[1]["n_vecs"] == 2
    assert got[2]["n_vecs"] == 0 and got[2]["share_e6"] == 0  # empty cell kept
    assert sum(v["n_vecs"] for v in got.values()) == 5


def test_join_skew_report_ranks_hotspots(spark):
    from bioeco_portal_etl_spark.operators.skew import join_skew_report

    left = spark.createDataFrame(
        [(k,) for k in [1] * 10 + [2] * 3 + [3]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1] * 5 + [2] * 8 + [4]], "k long"
    )
    got = [r.asDict() for r in
           join_skew_report(left, right, "k", top=3).orderBy("rank").collect()]
    assert [r["key"] for r in got] == [1, 2, 3]  # 50, 24, 0
    assert got[0]["est_out"] == 50 and got[1]["est_out"] == 24
    # keys absent on one side report 0 counts, est_out 0
    assert got[2]["n_right"] == 0 and got[2]["est_out"] == 0
