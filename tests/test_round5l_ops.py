"""Operator-level tests for the round-5 twelfth batch: TextRank grouped
PageRank (structure + per-doc isolation), patch-hash image dedupe
(fingerprint ground truth + planted duplicates), bounded-round weighted
SSSP (round semantics), zone-map skip logic, and the binned streaming
quantile picker (batch face)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_textrank_hub_word_ranks_first(spark):
    """In 'alpha beta alpha beta gamma' the word 'beta' neighbors both
    others (degree 2 vs 1) — TextRank must rank it first; the two
    endpoint words tie and break alphabetically."""
    from bioeco_portal_etl_spark.text.textrank import (
        cooccurrence_edges,
        textrank_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta gamma")], "doc_id long, text string"
    )
    e = cooccurrence_edges(docs, "doc_id", "text")
    assert {(r["src"], r["dst"]) for r in e.collect()} == {
        ("alpha", "beta"),
        ("beta", "alpha"),
        ("beta", "gamma"),
        ("gamma", "beta"),
    }
    out = textrank_keywords(e, iterations=2, k=3).orderBy("rank").collect()
    assert [r["word"] for r in out] == ["beta", "alpha", "gamma"]
    assert out[1]["pr_e9"] == out[2]["pr_e9"]  # symmetric endpoints tie


def test_textrank_docs_are_isolated(spark):
    """Grouped PageRank must not leak mass across documents: the same
    text in two docs yields identical per-doc rankings, and a third doc
    sharing words with them does not perturb their pr values."""
    from bioeco_portal_etl_spark.text.textrank import (
        cooccurrence_edges,
        textrank_keywords,
    )

    txt = "alpha beta gamma delta"
    docs2 = spark.createDataFrame(
        [(1, txt), (2, txt)], "doc_id long, text string"
    )
    docs3 = spark.createDataFrame(
        [(1, txt), (2, txt), (3, "alpha gamma alpha echo")],
        "doc_id long, text string",
    )
    tr = lambda d: {
        (r["doc_id"], r["rank"]): (r["word"], r["pr_e9"])
        for r in textrank_keywords(
            cooccurrence_edges(d, "doc_id", "text"), iterations=2, k=3
        ).collect()
    }
    r2, r3 = tr(docs2), tr(docs3)
    for rank in (1, 2, 3):
        assert r2[(1, rank)] == r2[(2, rank)] == r3[(1, rank)]


def test_patch_ahash_matches_pure_python_recompute(spark):
    """Fingerprints through the REAL PNG encode->decode must equal a
    direct recompute from the synthetic pixel formula — the exact
    invariant the mm11 oracle relies on."""
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
        patch_ahash,
        synth_rgb_png,
    )

    def expected(seed: int, patch: int = 4) -> tuple[int, int, int]:
        w = SYNTH_W_BASE + seed % SYNTH_W_MOD
        h = SYNTH_H_BASE + seed % SYNTH_H_MOD
        v = lambda x, y, c: (seed * 7 + x * 3 + y * 5 + c * 11) % 256
        allv = [v(x, y, c) for x in range(w) for y in range(h) for c in range(3)]
        im = sum(allv) // len(allv)
        nx, ny = (w + patch - 1) // patch, (h + patch - 1) // patch
        fp = 0
        for ty in range(ny):
            for tx in range(nx):
                vals = [
                    v(x, y, c)
                    for y in range(ty * patch, min(h, (ty + 1) * patch))
                    for x in range(tx * patch, min(w, (tx + 1) * patch))
                    for c in range(3)
                ]
                if sum(vals) // len(vals) >= im:
                    fp |= 1 << (ty * nx + tx)
        return w, h, fp

    ids = spark.createDataFrame([(i, i) for i in range(8)], "doc_id long, seed long")
    got = {
        r["media_id"]: (r["width"], r["height"], r["fingerprint"])
        for r in patch_ahash(synth_rgb_png(ids, "doc_id", "seed")).collect()
    }
    assert got == {i: expected(i) for i in range(8)}


def test_patch_ahash_planted_duplicates_group(spark):
    """Seed-sharing images must hash identically (that is the dedupe
    signal); distinct seeds with different dims must not collide."""
    from bioeco_portal_etl_spark.multimodal.media import (
        patch_ahash,
        synth_rgb_png,
    )

    ids = spark.createDataFrame(
        [(i, i % 3) for i in range(9)], "doc_id long, seed long"
    )
    rows = patch_ahash(synth_rgb_png(ids, "doc_id", "seed")).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(
            (r["width"], r["height"], r["fingerprint"]), set()
        ).add(r["media_id"])
    assert sorted(len(v) for v in by_key.values()) == [3, 3, 3]


def test_sssp_bounded_round_semantics(spark):
    """dist after r rounds = cheapest path using <= r edges: the direct
    expensive edge wins at round 1, the 2-hop cheap route replaces it at
    round 2, and an extra round changes nothing (fixpoint reached)."""
    from bioeco_portal_etl_spark.graph.sssp import sssp_bounded

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (1, 3, 10)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    d = lambda r: {
        row["node"]: row["dist"]
        for row in sssp_bounded(edges, seeds, rounds=r).collect()
    }
    assert d(1) == {1: 0, 2: 5, 3: 10}
    assert d(2) == {1: 0, 2: 5, 3: 6}
    assert d(3) == {1: 0, 2: 5, 3: 6}


def test_zone_map_skip_logic(spark):
    """A file is skipped iff the predicate interval is provably disjoint
    from its (min, max); conjunctions skip when ANY conjunct proves it."""
    from bioeco_portal_etl_spark.operators.zonemap import (
        skip_report,
        zone_maps,
    )

    df = spark.createDataFrame(
        [(k, k * 10, k % 2) for k in range(20)], "k long, v long, g long"
    )
    zm = zone_maps(df, (F.col("k") / 5).cast("long"), ["v"])  # 4 files of 5
    rep = {
        r["predicate"]: (r["files_total"], r["files_skipped"], r["rows_scanned"])
        for r in skip_report(
            zm,
            "t",
            [
                ("hit_one", [("v", 0, 40)]),
                ("hit_none", [("v", 1000, 2000)]),
                ("conj", [("v", 0, 40), ("v", 60, 70)]),
            ],
        ).collect()
    }
    assert rep["hit_one"] == (4, 3, 5)
    assert rep["hit_none"] == (4, 4, 0)
    assert rep["conj"] == (4, 4, 0)  # second conjunct disjoint everywhere


def test_binned_quantile_picker_batch_face(spark):
    """Batch-mode check of the streaming histogram quantiles: with 100
    values 0.00..0.99 in one window (all bin 0 at step $32) p50/p90 sit
    in bin 0; with values spread one per bin, p50 picks bin 7 (first
    cum >= n/2) and p90 bin 14 (first 10*cum >= 9*n)."""
    from bioeco_portal_etl_spark.streaming.windows import (
        windowed_binned_quantiles,
    )

    mk = lambda vals: spark.createDataFrame(
        [(f"2024-01-01 00:{i % 60:02d}:00", float(v)) for i, v in enumerate(vals)],
        "s string, value double",
    ).select(F.col("s").cast("timestamp").alias("ts"), "value")

    low = windowed_binned_quantiles(mk([i / 100 for i in range(100)])).collect()
    assert len(low) == 1 and low[0]["p50_bin"] == 0 and low[0]["p90_bin"] == 0
    assert low[0]["n"] == 100 and low[0]["p50_est_cents"] == 0

    spread = windowed_binned_quantiles(
        mk([32 * b + 1 for b in range(16)])
    ).collect()[0]
    assert spread["n"] == 16
    assert spread["p50_bin"] == 7 and spread["p90_bin"] == 14
    assert spread["p90_est_cents"] == 14 * 3200
