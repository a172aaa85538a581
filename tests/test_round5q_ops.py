"""Operator-level tests for the round-5 seventeenth batch: degree
assortativity (sign on known topologies + the overflow regression),
consistent-hash ring (balance, determinism, movement bound), Bloom FPR
(zero false negatives by construction, measured FPR sane), ANN cascade
(fallback routing), and frame ZCR ground truth."""

from __future__ import annotations

import pyspark.sql.functions as F


def _sym(spark, pairs):
    fwd = spark.createDataFrame(pairs, "src long, dst long")
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_assortativity_star_is_negative_chain_interior_positive(spark):
    """A star (hub to leaves) is maximally disassortative: every edge
    pairs degree n-1 with degree 1 -> r = -1 exactly. A long path is
    mildly positive-to-neutral by contrast (interior 2-2 edges
    dominate)."""
    from bioeco_portal_etl_spark.graph.degrees import degree_assortativity

    star = _sym(spark, [(0, i) for i in range(1, 7)])
    r_star = degree_assortativity(star).collect()[0]
    assert r_star["assortativity_e6"] == -1_000_000
    path = _sym(spark, [(i, i + 1) for i in range(12)])
    r_path = degree_assortativity(path).collect()[0]
    assert r_path["assortativity_e6"] > r_star["assortativity_e6"]


def test_ring_assignment_deterministic_and_balanced(spark):
    """Same keys, same ring -> identical assignment; every key lands on
    a valid shard; with 16 vnodes per shard no shard is empty or
    hoarding (loose bound: no shard above 60%)."""
    from bioeco_portal_etl_spark.operators.sharding import (
        hash_ring,
        ring_assign,
    )

    keys = spark.createDataFrame([(i,) for i in range(400)], "k long")
    ring = hash_ring(spark, 4, 16)
    a1 = {r["k"]: r["shard"] for r in ring_assign(keys, "k", ring).collect()}
    a2 = {r["k"]: r["shard"] for r in ring_assign(keys, "k", ring).collect()}
    assert a1 == a2 and set(a1.values()) <= {0, 1, 2, 3}
    from collections import Counter

    counts = Counter(a1.values())
    assert len(counts) == 4 and max(counts.values()) < 240


def test_ring_movement_far_below_modulo(spark):
    """Adding a fifth shard must move FAR fewer keys than modulo
    resharding would (~80% for %4 -> %5); the ring should stay under
    half that."""
    from bioeco_portal_etl_spark.operators.sharding import (
        hash_ring,
        resharding_report,
    )

    keys = spark.createDataFrame([(i,) for i in range(500)], "k long")
    rep = resharding_report(
        keys, "k", hash_ring(spark, 4, 16), hash_ring(spark, 5, 16)
    ).collect()[0]
    assert rep["n_keys"] == 500
    assert rep["moved_e6"] < 400_000  # modulo would move ~800_000


def test_bloom_fpr_no_false_negatives_and_sane_rate(spark):
    """Probing the INSERTED keys must return all-true (no false
    negatives — the Bloom guarantee); probing a disjoint set yields a
    small positive rate in the theory ballpark."""
    from bioeco_portal_etl_spark.sketches.bloom_md5 import (
        bloom_build_md5,
        bloom_contains_md5,
    )

    ins = spark.createDataFrame([(i,) for i in range(500)], "key long")
    probe = spark.createDataFrame(
        [(1_000_000 + i,) for i in range(500)], "key long"
    )
    bloom = bloom_build_md5(ins, "key", 4096, 3)
    self_hits = bloom_contains_md5(ins, bloom, "key", 4096, 3)
    assert self_hits.filter(~F.col("possibly_seen")).count() == 0
    fp = bloom_contains_md5(probe, bloom, "key", 4096, 3).filter(
        F.col("possibly_seen")
    ).count()
    assert 0 <= fp < 150  # theory ~ (1-e^-0.366)^3 ~ 2.9% of 500 ~ 15


def test_ann_cascade_routes_and_restores_exact(spark):
    """With a sky-high threshold every query falls back and the result
    equals exact top-k; with threshold 0 no query falls back (all rows
    path='ivf')."""
    from bioeco_portal_etl_spark.similarity.cascade import (
        ann_with_exact_fallback,
    )
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk
    from bioeco_portal_etl_spark.similarity.sq import DIM

    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(DIM)]) for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = corpus.filter(F.col("vec_id") < 3)
    cents = corpus.filter(F.col("vec_id") < 4)
    allfb = ann_with_exact_fallback(
        corpus, q, cents, "embedding", "vec_id", k=3, nprobe=1,
        min_best_e4=10_001,
    )
    assert allfb.filter(F.col("path") != "exact").count() == 0
    exact = cosine_topk(corpus, q, "embedding", "vec_id", k=3)
    got = {(r["query_id"], r["rank"], r["match_id"]) for r in allfb.collect()}
    want = {(r["query_id"], r["rank"], r["match_id"]) for r in exact.collect()}
    assert got == want
    nofb = ann_with_exact_fallback(
        corpus, q, cents, "embedding", "vec_id", k=3, nprobe=1,
        min_best_e4=-10_000,
    )
    assert nofb.filter(F.col("path") != "ivf").count() == 0


def test_wav_frame_zcr_ground_truth(spark):
    """An alternating-sign square wave crosses zero at every adjacent
    pair: a 320-sample clip in 160-frames reports zcr = 159 per frame;
    a constant-positive clip reports zcr = 0."""
    import pandas as pd

    from bioeco_portal_etl_spark.multimodal.media import wav_frame_zcr
    from bioeco_portal_etl_spark.multimodal.wavpcm import encode_wav

    alt = encode_wav([100 if i % 2 == 0 else -100 for i in range(320)])
    const = encode_wav([7] * 320)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [alt, const]})
    )
    out = {
        (r["media_id"], r["frame_id"]): (r["n_samples"], r["zcr"], r["energy"])
        for r in wav_frame_zcr(df, frame=160).collect()
    }
    assert out[(1, 0)] == (160, 159, 160 * 100 * 100)
    assert out[(1, 1)] == (160, 159, 160 * 100 * 100)
    assert out[(2, 0)] == (160, 0, 160 * 49)
