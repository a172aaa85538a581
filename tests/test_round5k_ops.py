"""Operator-level tests for the round-5 eleventh batch: HyperBall ball
sketches (linear-counting small-range behavior and its cross-engine
floor-boundary guard), ViT patch tiling, Variant shredding, streaming
HLL distinct (chained-agg equals direct estimate), and SQ distortion
(exact-representable corpus -> zero error)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hyperball_path_graph_ball_growth(spark):
    """On the path a-b-c (undirected): every r=0 ball is 1; at r=1 the
    middle node sees all three and the endpoints see two; estimates are
    exact here because linear counting is exact while bucket collisions
    are absent (checked explicitly, not assumed)."""
    from bioeco_portal_etl_spark.graph.hyperball import hyperball_neighborhood
    from bioeco_portal_etl_spark.sketches.hll import hll_registers

    a, b, c = 101, 202, 303
    # precondition: the three ids land in three distinct buckets
    n_buckets = (
        hll_registers(
            spark.createDataFrame([(a,), (b,), (c,)], "node long"), [], "node"
        ).count()
    )
    assert n_buckets == 3
    fwd = spark.createDataFrame([(a, b), (b, c)], "src long, dst long")
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = spark.createDataFrame([(a,), (b,), (c,)], "node long")
    out = {
        (r["node"], r["r"]): r["ball_est"]
        for r in hyperball_neighborhood(edges, nodes, radius=2).collect()
    }
    assert out[(a, 0)] == out[(b, 0)] == out[(c, 0)] == 1
    assert out[(b, 1)] == 3 and out[(a, 1)] == 2 and out[(c, 1)] == 2
    assert out[(a, 2)] == 3 and out[(c, 2)] == 3  # full path reached


def test_hyperball_linear_counting_floor_margin():
    """The cross-engine safety property the estimator rests on: every
    linear-counting value 64*ln(64/V) sits far (>1e-3) from a floor
    boundary, so a 1-ulp ln() divergence between Spark and DuckDB can
    never flip the floored surface."""
    from bioeco_portal_etl_spark.graph.hyperball import (
        _lin_boundary_min_distance,
    )

    assert _lin_boundary_min_distance() > 1e-3


def test_patch_grid_clipping_and_row_major_order(spark):
    """10x6 image, patch 4: 3x2 grid, row-major ids, edge tiles clipped
    to 2 wide / 2 tall."""
    from bioeco_portal_etl_spark.multimodal.media import patch_grid

    meta = spark.createDataFrame(
        [(7, 10, 6)], "media_id long, width long, height long"
    )
    rows = {
        r["patch_id"]: (r["px0"], r["py0"], r["pw"], r["ph"])
        for r in patch_grid(meta, patch=4).collect()
    }
    assert len(rows) == 6
    assert rows[0] == (0, 0, 4, 4)
    assert rows[2] == (8, 0, 2, 4)  # right edge clipped
    assert rows[3] == (0, 4, 4, 2)  # bottom edge clipped
    assert rows[5] == (8, 4, 2, 2)  # corner clipped both ways


def test_shred_variant_typed_and_permissive(spark):
    """try_variant_get: present path extracts typed; missing path and
    type-mismatched path both yield NULL instead of failing the row."""
    from bioeco_portal_etl_spark.functions.variant import shred_variant

    df = spark.createDataFrame(
        [(1, '{"meta": {"k": 42}, "tag": "x"}'), (2, '{"tag": "y"}')],
        "id long, j string",
    )
    out = {
        r["id"]: (r["k"], r["tag"], r["bad"])
        for r in shred_variant(
            df,
            "j",
            {
                "k": ("$.meta.k", "bigint"),
                "tag": ("$.tag", "string"),
                "bad": ("$.tag", "bigint"),  # type mismatch -> NULL
            },
            keep=["id"],
        ).collect()
    }
    assert out[1] == (42, "x", None)
    assert out[2] == (None, "y", None)


def test_windowed_hll_chain_equals_direct_estimate(spark):
    """The chained (register max -> estimate) path must produce the same
    numbers as estimating the registers directly — the cascade adds
    drainability, never a different answer."""
    from bioeco_portal_etl_spark.sketches.hll import hll_estimate, hll_registers
    from bioeco_portal_etl_spark.streaming.windows import windowed_distinct_hll

    ev = spark.createDataFrame(
        [(i, f"2024-01-01 {h:02d}:15:00") for h in (0, 1) for i in range(h * 7, h * 7 + 30)],
        "user_id long, s string",
    ).select("user_id", F.col("s").cast("timestamp").alias("ts"))
    chained = {
        str(r["window_start"]): r["est_distinct"]
        for r in windowed_distinct_hll(ev, "1 hour", "user_id").collect()
    }
    keyed = ev.select(F.window("ts", "1 hour").alias("w"), "user_id")
    direct = {
        str(r["w"]["start"]): r["est_distinct"]
        for r in hll_estimate(hll_registers(keyed, ["w"], "user_id"), ["w"]).collect()
    }
    assert chained == direct and len(chained) == 2


def test_sq_distortion_zero_on_exactly_representable(spark):
    """One-hot vectors: normalization is the identity, amax = 1, codes
    hit +-127 exactly, dequantization reconstructs bit-for-bit -> every
    mse_e12 is exactly 0. Any nonzero here means the encode/decode pair
    drifted."""
    from bioeco_portal_etl_spark.similarity.sq import DIM, sq_distortion

    rows = [
        (i, [1.0 if d == i else 0.0 for d in range(DIM)]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sq_distortion(df, "embedding", "vec_id").collect()
    assert len(out) == 6 and all(r["mse_e12"] == 0 for r in out)


def test_sq_distortion_nonnegative_and_bounded(spark):
    """General corpus: every per-vector error is >= 0 and below the
    worst-case bound 64 * (amax/127-quantum)^2 ~ small — here just
    sanity-bounded by 64 * 1e12 (error per dim can't exceed 1 for unit
    vectors)."""
    from bioeco_portal_etl_spark.similarity.sq import DIM, sq_distortion

    rows = [
        (i, [((i * 31 + d * 7) % 13 - 6) / 6.0 for d in range(DIM)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sq_distortion(df, "embedding", "vec_id").collect()
    assert len(out) == 20
    assert all(0 <= r["mse_e12"] <= 64 * 10**12 for r in out)
