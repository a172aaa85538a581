"""Operator-level tests for the round-5 fourteenth batch: BOM rollup
(multiplicative path semiring), real-pixel resize round-trip, market-
basket rules, sparse doc cosine, and time-weighted averages."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bom_rollup_multiplies_along_path(spark):
    """Forest 1 <- 2 (qty 3) <- 4 (qty 5), 1 <- 3 (qty 2): eff_qty is
    the product along the chain to (not including) the root; roots get
    1; everyone reports the correct root."""
    from bioeco_portal_etl_spark.operators.hierarchy import bom_rollup

    nodes = spark.createDataFrame(
        [(1, None, 1), (2, 1, 3), (3, 1, 2), (4, 2, 5)],
        "node long, parent long, qty long",
    )
    out = {
        r["node"]: (r["root"], r["eff_qty"])
        for r in bom_rollup(nodes, max_depth=4).collect()
    }
    assert out == {1: (1, 1), 2: (1, 3), 3: (1, 2), 4: (1, 15)}


def test_bom_rollup_deep_chain_within_depth(spark):
    """A 6-deep chain of qty 2 resolves exactly at max_depth >= 6 —
    eff_qty 2^k at depth k, all rooted at the head."""
    from bioeco_portal_etl_spark.operators.hierarchy import bom_rollup

    rows = [(0, None, 1)] + [(i, i - 1, 2) for i in range(1, 7)]
    nodes = spark.createDataFrame(rows, "node long, parent long, qty long")
    out = {
        r["node"]: (r["root"], r["eff_qty"])
        for r in bom_rollup(nodes, max_depth=8).collect()
    }
    assert out == {i: (0, 2**i if i else 1) for i in range(7)}


def test_resize_roundtrip_matches_formula(spark):
    """Thumbnail channel stats through decode->resize->encode->decode
    must equal a pure-Python recompute of the nearest-neighbor index
    map over the source formula."""
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
        decode_image,
        png_channel_stats,
        resize_media,
        synth_rgb_png,
    )

    def expected(seed: int, m: int = 5):
        w = SYNTH_W_BASE + seed % SYNTH_W_MOD
        h = SYNTH_H_BASE + seed % SYNTH_H_MOD
        out_w = w * min(m, max(w, h)) // max(w, h)
        out_h = max(h * min(m, max(w, h)) // max(w, h), 1)
        res = {}
        for c in range(3):
            vals = [
                (seed * 7 + (ox * w // out_w) * 3 + (oy * h // out_h) * 5 + c * 11)
                % 256
                for oy in range(out_h)
                for ox in range(out_w)
            ]
            res[c] = (len(vals), sum(vals) // len(vals), min(vals), max(vals))
        return res

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    thumbs = resize_media(
        synth_rgb_png(ids, "doc_id"), max_dim=5, decode_fn=decode_image
    ).select("media_id", F.col("thumb").alias("payload"))
    got = {
        (r["media_id"], r["channel"]): (
            r["n_px"],
            r["mean_v"],
            r["min_v"],
            r["max_v"],
        )
        for r in png_channel_stats(thumbs).collect()
    }
    for seed in range(6):
        exp = expected(seed)
        for c in range(3):
            assert got[(seed, c)] == exp[c], (seed, c)


def test_association_rules_exact_metrics(spark):
    """Three baskets: {a,b}, {a,b}, {a,c} — support(a)=3, support(b)=2,
    support_ab=2, conf a->b = 666666 e6, conf b->a = 1e6, lift =
    2*3/(3*2) = 1e6 exactly."""
    from bioeco_portal_etl_spark.operators.basket import association_rules

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        "basket long, item string",
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "basket", "item", min_support=1).collect()
    }
    ab = out[("a", "b")]
    assert ab["support_ab"] == 2 and ab["support_a"] == 3 and ab["support_b"] == 2
    assert ab["conf_ab_e6"] == 666_666 and ab["conf_ba_e6"] == 1_000_000
    assert ab["lift_e6"] == 1_000_000
    assert out[("a", "c")]["support_ab"] == 1


def test_doc_cosine_identical_docs_hit_e6(spark):
    """Two identical documents over rare terms score cos2 = 1e6 exactly;
    an unrelated doc pairs with neither; the max_df cut drops a term
    present everywhere."""
    from bioeco_portal_etl_spark.text.doccosine import (
        doc_cosine2_pairs,
        term_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo alpha common"),
            (2, "alpha bravo alpha common"),
            (3, "zulu yankee common"),
        ],
        "doc_id long, text string",
    )
    tc = term_counts(docs, "doc_id", "text")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["cos2_e6"]
        for r in doc_cosine2_pairs(tc, max_df=2).collect()
    }
    # 'common' has df=3 > 2 -> excluded, so docs 1,2 share alpha+bravo
    assert pairs == {(1, 2): 1_000_000}


def test_time_weighted_avg_weights_by_duration(spark):
    """value 1.00 held 30s then 4.00 held 10s (last obs dropped):
    twa = (100*30 + 400*10) / 40 = 175 cents -> twa_e4 = 1_750_000;
    a burst of rapid identical updates must NOT shift it."""
    from bioeco_portal_etl_spark.operators.timeseries import time_weighted_avg

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:00:30", 4.0),
        (1, "2024-01-01 00:00:40", 9.9),  # last: excluded
    ]
    df = spark.createDataFrame(rows, "k long, s string, value double").select(
        "k", F.col("s").cast("timestamp").alias("ts"), "value"
    )
    out = time_weighted_avg(df, ["k"]).collect()[0]
    assert out["n_obs"] == 2 and out["span_secs"] == 40
    assert out["twa_e4"] == 1_750_000

    burst = rows[:1] + [
        (1, f"2024-01-01 00:00:{10 + i}", 1.0) for i in range(3)
    ] + rows[1:]
    df2 = spark.createDataFrame(
        burst, "k long, s string, value double"
    ).select("k", F.col("s").cast("timestamp").alias("ts"), "value")
    out2 = time_weighted_avg(df2, ["k"]).collect()[0]
    assert out2["twa_e4"] == 1_750_000  # plain mean would drop; TWA holds


def test_association_rules_relative_support_scale_free(spark):
    """The round-8 relative-support form (support*per >= n_baskets) is
    scale-FREE: replicating every basket 3x (fresh basket ids) scales
    support_ab and n_baskets together, so the pass set, confidences and
    lifts are identical — exactly the invariance the absolute cut in
    x35's original form lacked (PORTABILITY.md round-8 section)."""
    from bioeco_portal_etl_spark.operators.basket import association_rules

    base = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    rep = [(b + 10 * i, it) for i in range(3) for (b, it) in base]
    df1 = spark.createDataFrame(base, "basket long, item string")
    df3 = spark.createDataFrame(rep, "basket long, item string")

    def key(df):
        return {
            (r["item_a"], r["item_b"]): (
                r["conf_ab_e6"], r["conf_ba_e6"], r["lift_e6"],
            )
            for r in association_rules(
                df, "basket", "item", min_support=1, min_support_per=2
            ).collect()
        }

    r1, r3 = key(df1), key(df3)
    assert r1 == r3
    # the relative cut did cut something (support 1 of 3 baskets < 1/2)
    assert ("a", "c") not in r1 and ("a", "b") in r1
