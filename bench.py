#!/usr/bin/env python
"""Benchmark runner: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Execution is measured end-to-end per query with a noop sink (full plan runs,
nothing is collected to the driver) after a warm-up of the parquet footers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pyspark.sql.functions as F  # noqa: E402

from bioeco_portal_etl_spark import catalog  # noqa: E402
from bioeco_portal_etl_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q4_priority_exists",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "a1_grouped_merge",
    "a2_dedupe_keep_first",
    "a4_make_unique",
    "g2_multipoint_union",
    "g7_linestring_track",
    "j1_broadcast_left_join",
    "u1_union_by_name",
    "r2_unpivot_flags",
    # LLM-pipeline extensions
    "tx1_token_counts",
    "tx3_quality",
    "td1_exact_dedupe",
    "td2_minhash_lsh",
    "td4_jaccard_pairs",
    "ts1_cosine_topk",
    "ts3_ivf_topk",
    "ts6_ivfpq_topk",
    "td8_segment_dedupe",
    "w1_tumbling",
    "w4_sessionize",
    "x1_salted_agg",
    "x7_temperature_mix",
    "x8_fuzzy_match",
    "x9_snapshot_diff",
    "x10_url_dedupe",
    "rel5_topk_per_group",
    # round-3/4 operators (judge: the newest, heaviest code needs wall-time
    # tracking so perf regressions are visible round-over-round)
    "g10_point_in_polygon",
    "g11_pip_grid",
    "x11_resample_interpolate",
    "rel12_setops",
    "rel13_range_frame",
    "mm2_resize_meta",
    "td9_cluster_keep_best",
    "ts7_pq_refine_topk",
    "tx11_lm_score",
    "mm3_frame_sample",
    "rel14_hierarchy_flatten",
    "rel15_rank_quantiles",
    "g12_poly_measure",
    # streaming: each times a full availableNow drain through the state store
    "w5_streaming_sessions",
    "w6_streaming_dedupe",
    "w7_stream_interval_join",
    # round-4: sketches, graph, robust/islands, weighted sampling, anomaly,
    # vocab diagnostics
    "sk1_kmv_distinct",
    "sk2_cms_heavy_hitters",
    "sk3_hll_distinct",
    "sk4_bloom_gate",
    "gr1_pagerank",
    "gr2_triangles",
    "rel16_median_mad",
    "rel17_islands",
    "x12_weighted_sample",
    "x13_rolling_zscore",
    "tx12_vocab_growth",
    "sk5_kmv_setops",
    "rel18_interval_merge",
    "x14_ewma",
    "mm4_audio_energy",
    "rel19_funnel",
    "x15_temporal_split",
    "tx13_bigram_lm",
    "gr3_khop_reach",
    "rel20_rolling_distinct",
    "tx14_readability",
    "w8_streaming_anomaly",
    "rel21_attribution",
    "rel22_cohort_retention",
    "rel23_transitions",
    "tx15_token_entropy",
    "tx16_pmi_bigrams",
    "tx17_postings",
    "x16_histogram",
    "x17_winsorize",
    "x18_cusum_drift",
    "sk6_sampled_quantiles",
    "dq1_profile",
    "td10_containment",
    "w9_streaming_tumbling",
    "gr4_degree_hist",
    "x19_group_normalize",
    "rel24_cdc_apply",
    "tx18_script_detect",
    "tx19_boilerplate",
    "gr5_node_similarity",
    "mm5_scene_cuts",
    "ts8_mmr_rerank",
    "x20_equidepth_bins",
    "dq2_referential",
    "rel25_missing_days",
    "w10_streaming_update_counts",
    "x21_dup_matrix",
    # full TPC-H plan-family sweep (q1/3/4/5/6/17/18/19 already above) —
    # all 22 now carry wall-time so no plan family regresses silently
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_value_suppliers",
    "q12_lateness_priority",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q20_part_stock_chain",
    "q21_waiting_supplier",
    "q22_idle_customers",
    # heavier previously-unbenched operators
    "rel6_asof_join",
    "rel7_range_join",
    "rel9_cube",
    "td3_simhash",
    "td5_embedding_neardup",
    "td6_decontamination",
    "td7_dup_clusters",
    "ts2_lsh_bucket_topk",
    "ts4_kmeans_ivf",
    "ts5_pq_topk",
    "tx9_repetition",
    "tx10_tfidf_top_terms",
    "x2_stratified_split",
    "x3_sequence_packing",
    # round-5: complete the sweep — every catalog entry with a batch face
    # carries wall-time (test_bench_contract.py pins bench==catalog), so
    # nothing regresses silently. These are the light r1-r2 entries.
    "a3_duplicate_audit",
    "f_filters",
    "g1_point_wkt",
    "g5_geom_type",
    "g9_union_points_geojson",
    "j4_differing_key_names",
    "mm1_media_metadata",
    "p0_canonical_entities",
    "p12_make_identifier",
    "p18_row_number",
    "p19_sql_script",
    "p1_select_rename",
    "p3_blanks_to_null",
    "p4_flag_columns",
    "p6_recode_passthrough",
    "p7_str_trunc",
    "p8_p9_year_dates",
    "rel10_window_suite",
    "rel11_scd2_merge",
    "rel1_rollup",
    "rel2_lead_lag",
    "rel3_semi_anti",
    "rel4_conditional_pivot",
    "rel8_json_props",
    "tx2_language_id",
    "tx4_fingerprint",
    "tx5_normalize",
    "tx6_pii_redact",
    "tx7_top_bigrams",
    "tx8_length_quantiles",
    # round-5 third batch
    "tx21_bpe_merges",
    "td11_semantic_dedupe",
    "x24_zorder_layout",
    "dq6_benford",
    "mm8_phash_groups",
    "w12_stream_outer_join",
    # round-5 fourth batch
    "tx22_bm25",
    "ts11_rrf_fusion",
    "gr7_label_communities",
    "gr8_kcore",
    "dq7_profile_drift",
    "x25_salted_join",
    # round-5 fifth batch
    "tx23_heavy_hitters",
    "tx24_bpe_encode",
    "x26_bloom_join",
    "dq8_lateness_audit",
    "rel26_pivot",
    "mm9_wav_downsample",
    # round-5 sixth batch
    "w13_stream_two_level_agg",
    "td12_lsh_quality",
    "x27_epoch_shuffle",
    "x28_compaction_plan",
    "tx25_blocklist_filter",
    "rel27_rolling_slope",
    # round-5 seventh batch
    "gr9_hits",
    "tx26_rake_keywords",
    "ts12_range_search",
    "ts13_filtered_ann",
    "x29_cdc_net_effect",
    "w14_stream_complete_topk",
    # round-5 eighth batch
    "gr10_random_walks",
    "x30_scd2_asof",
    "rel28_percent_rank",
    # round-5 tenth batch
    "rel29_grouping_sets",
    "sk7_hll_merge",
    "tx29_ngram_coverage",
    "ts15_ivf_balance",
    "x32_join_skew_report",
    # round-6 tenth batch
    "gr21_edge_support",
    "dq16_id_gaps",
    "ts24_norm_profile",
    "td15_soft_dedupe_weights",
    "mm22_crest_factor",
    # round-6 ninth batch
    "td14_dedupe_agreement",
    "x48_top_movers",
    "rel37_top_paths",
    "mm21_frame_motion",
    "tx40_hapax_ratio",
    # round-6 eighth batch
    "mm20_shot_lengths",
    "sk13_histq_error_sweep",
    "ts23_pq_utilization",
    "x47_decile_lift",
    "rel36_cycle_time",
    # round-6 seventh batch
    "gr20_modularity",
    "rel35_period_growth",
    "ts22_centroid_drift",
    "dq15_key_discovery",
    "x46_ndv_estimate_audit",
    # round-6 sixth batch
    "ts21_nprobe_sweep",
    "sk12_cms_error_sweep",
    "tx38_garbage_score",
    "mm19_channel_correlation",
    "dq14_expectation_drift",
    # round-6 fifth batch
    "tx37_bpe_fertility",
    "x45_bitmap_estimate",
    "td13_shard_dup_locality",
    "gr19_rich_club",
    "w20_stream_union_dedupe",
    # round-6 fourth batch
    "rel33_max_concurrency",
    "x43_weighted_median",
    "x44_join_card_estimate",
    "mm18_gain_normalization",
    "tx36_langid_confusion",
    # round-6 third batch
    "tx35_term_burstiness",
    "ts20_matryoshka_recall",
    "sk11_minhash_lang_sim",
    "mm17_jpeg_blockiness",
    "dq13_duplicate_burden",
    # round-6 second batch
    "tx34_ngram_novelty",
    "x40_skyline_2d",
    "gr18_clustering_coeff",
    "mm16_pixel_gini",
    "x41_nucleus_coverage",
    # round-6 first batch
    "mm14_jpeg_roundtrip",
    "mm15_wav_silence_trim",
    "gr17_adamic_adar",
    "ts19_centroid_stats",
    "dq12_split_balance",
    # round-5 seventeenth batch
    "gr16_assortativity",
    "x39_consistent_hashing",
    "sk10_bloom_fpr",
    "ts18_ann_cascade",
    "mm13_frame_zcr",
    # round-5 sixteenth batch
    "gr15_effective_diameter",
    "x38_ab_test",
    "tx33_zipf_fit",
    "ts17_topk_diversity",
    "dq11_expectations",
    # round-5 fifteenth batch
    "gr14_harmonic_centrality",
    "rel32_window_funnel",
    "x37_range_partition_audit",
    "tx32_feature_hashing",
    "w19_stream_native_sessions",
    # round-5 fourteenth batch
    "rel31_bom_rollup",
    "mm12_resize_pixels",
    "x35_market_basket",
    "tx31_doc_cosine",
    "x36_time_weighted_avg",
    # round-5 thirteenth batch
    "gr13_personalized_pagerank",
    "dq10_l_diversity",
    "sk8_hist_merge_quantiles",
    "x34_selectivity_audit",
    "w18_stream_cms_topk",
    # round-5 twelfth batch
    "tx30_textrank",
    "mm11_patch_dupes",
    "gr12_sssp",
    "x33_zone_skip",
    "w17_stream_binned_quantiles",
    # round-5 eleventh batch
    "gr11_hyperball",
    "mm10_patch_grid",
    "rel30_variant_shred",
    "w16_stream_hll_distinct",
    "ts16_sq_distortion",
    # round-5 ninth batch
    "tx27_gopher_rules",
    "dq9_fd_violations",
    "x31_dsir_weights",
    "ts14_hard_negatives",
    "w15_stream_cdc_upsert",
    "w2_sliding",
    "w3_session",
    "x4_source_cap",
    "x5_chunk_windows",
    "x6_corpus_stats",
    # round-5 additions
    "gr6_dup_components",
    "dq3_split_leakage",
    "x22_incremental_agg",
    "mm6_png_channel_stats",
    "ts9_recall_at_k",
    "mm7_wav_clip_stats",
    "x23_scd2_history",
    "tx20_winnow_fingerprints",
    "w11_stream_static_enrich",
    "dq4_psi_drift",
    "ts10_sq8_topk",
    "dq5_k_anonymity",
    # round-7 first batch
    "mm23_jpeg_color_roundtrip",
    "td16_minhash_error_sweep",
    "tx41_rank_stability",
    "ts25_dim_covariance",
    "x49_poisson_bootstrap",
    # round-7 second batch
    "x50_ks_test",
    "tx42_js_divergence",
    "gr22_assortativity",
    "td17_truncation_dupes",
    "rel38_time_weighted_avg",
    # round-7 third batch
    "w21_stream_locf_segments",
    "x51_exact_quantiles",
    "gr23_degree_inequality",
    "dq17_freshness_lag",
]

# The 26 queries benched identically since round 1 — their sum is the
# cross-round comparable number (the full-suite total grows every round as
# operators land, so it is NOT comparable across rounds).
STABLE_26 = [
    "a1_grouped_merge", "a2_dedupe_keep_first", "a4_make_unique",
    "g2_multipoint_union", "g7_linestring_track", "j1_broadcast_left_join",
    "q17_small_qty_revenue", "q18_large_orders", "q19_disjunctive_pred",
    "q1_pricing_summary", "q3_shipping_priority", "q4_priority_exists",
    "q5_region_revenue", "q6_revenue_forecast", "r2_unpivot_flags",
    "rel5_topk_per_group", "td1_exact_dedupe", "td2_minhash_lsh",
    "td4_jaccard_pairs", "ts1_cosine_topk", "ts3_ivf_topk",
    "tx1_token_counts", "tx3_quality", "u1_union_by_name",
    "w1_tumbling", "x1_salted_agg",
]


# Nominal cost of the sustained-calibration row on the round-7-era
# reference host (see _calibration_sustained_df's sizing note). The
# normalized headline divides measured sustained time by this, making
# BENCH_r{N} comparisons self-adjudicating — rounds 7-9 each had to
# manually re-litigate "is this a regression or a slow host?" and the
# answer was "slow host" every time (VERDICT r9 item 3).
SUSTAINED_NOMINAL_SEC = 30.0


def _normalize_by_sustained(sec: float, calib_sustained: float) -> float:
    """sec × (nominal / measured) for the sustained row: what this
    measurement WOULD read on the reference-speed host. -1 when the
    sustained row was skipped/invalid (reader falls back to raw)."""
    if calib_sustained is None or calib_sustained <= 0:
        return -1.0
    return round(sec * SUSTAINED_NOMINAL_SEC / calib_sustained, 3)


def compact_line(
    timings: dict[str, float],
    sf: float,
    stable26: float,
    calib: float,
    calib_shuffle: float = -1.0,
    calib_sustained: float = -1.0,
    cold_total: float = -1.0,
    stable26_cold: float = -1.0,
) -> str:
    """The FINAL stdout line the external driver parses (it keeps only the
    last ~2000 chars). Carries the top-10 slowest queries, not the full map —
    length must stay bounded no matter how large the catalog grows."""
    compact = {
        "metric": "headline_suite_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        # top-10 slowest; full 100+-query map is in bench_full.json and the
        # preceding stdout line
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10]),
        "sf": sf,
        # cross-round comparable subset (see STABLE_26 above)
        "stable26_sec": stable26,
        # machine-speed yardstick (see _calibration) — divide the
        # stable26/total numbers by this before cross-round compare
        "calibration_sec": round(calib, 3),
        # shuffle/memory-bandwidth yardstick (see _calibration_shuffle_df)
        "calibration_shuffle_sec": round(calib_shuffle, 3),
        # sustained-throughput yardstick (see _calibration_sustained_df) —
        # the axis the two burst rows miss (round-8 host-drift postmortem)
        "calibration_sustained_sec": round(calib_sustained, 3),
        # SELF-ADJUDICATING cross-round number (VERDICT r9 item 3):
        # stable26 normalized to the reference-speed host via the
        # sustained row — compare THIS field across BENCH_r{N}.json, not
        # the raw stable26_sec (reading rule in SCALING.md "Bench
        # methodology")
        "stable26_per_sustained": _normalize_by_sustained(
            stable26, calib_sustained
        ),
        # round-13 addition: total/stable26 of the timed warm-up (cold)
        # pass — see main(); -1 when the caller predates the addition
        "cold_total_sec": round(cold_total, 3),
        "stable26_cold_sec": round(stable26_cold, 3),
        "n_queries": len(timings),
    }
    line = json.dumps(compact)
    assert len(line) < 1500, f"final bench line too long ({len(line)} B)"
    return line


def _bench_one(spark, name: str, sf_dir: str) -> tuple[float, float]:
    """Steady-state timing for one query: 1 warm-up (timed since round 13
    and returned as the cold number — cache fills land here), min of 3.
    Returns (min_of_3, cold)."""
    qmap = catalog.queries()
    t0 = time.perf_counter()
    qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best, cold


def _calibration_df(spark):
    return spark.range(1_500_000_000).selectExpr(
        "sum(id * 3 + 1) AS s", "count(*) AS n"
    )


def _calibration_shuffle_df(spark):
    # Second calibration axis (round 8, the gr17 adjudication): a fixed
    # 20M-row hash-shuffle + two-phase aggregate. The pure-codegen row
    # above tracks CPU frequency; queries dominated by exchange write/
    # read (wedge joins, wide aggs) are bound by memory bandwidth and
    # shuffle-spill I/O, which the r7 gr17 window moved WITHOUT the CPU
    # row moving. Reporting both lets a reader see WHICH host resource
    # drifted between rounds.
    return (
        spark.range(20_000_000)
        .selectExpr("id % 1000000 AS k", "id AS v")
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .selectExpr("sum(s) AS s", "sum(n) AS n")
    )


def _calibration_sustained_df(spark):
    # Third calibration axis (round 9, VERDICT r8 item 4): a SUSTAINED
    # (~30s nominal) all-core mixed CPU+shuffle workload. The two burst
    # rows above (1.5G-row codegen ~ CPU frequency; 20M-row shuffle ~
    # memory/shuffle bandwidth) both finish in ~1s, and the round-8
    # same-day A/B proved a drift mode NEITHER catches: sustained
    # throughput sagging (thermal/cgroup/noisy-neighbor pressure that
    # only engages under continuous load) while burst numbers stay
    # normal — two consecutive rounds' headline numbers were distorted
    # by it. This row holds all cores busy long enough for that
    # pressure to engage: per-row integer mixing (CPU) feeding a
    # 25M-group two-phase hash aggregate (shuffle write+read+spill),
    # then a second 1M-group reduction. Fixed literal workload — no
    # I/O, no data dependence, byte-identical across rounds.
    # Sizing: ~30s nominal on the round-7-era reference host (cpu calib
    # ~0.09); measured 133s on the round-9 degraded host at cpu calib
    # 0.438 (~4.7x) — that ratio IS the signal this row exists to expose.
    return (
        spark.range(400_000_000)
        .selectExpr(
            "id % 8000000 AS k",
            # Knuth multiplicative mix keeps the map side CPU-bound so
            # the row exercises both resources at once, like real queries
            "((id * 2654435761) % 1000003) * 3 + 1 AS v",
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .selectExpr("k % 500000 AS k2", "s", "n")
        .groupBy("k2")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .selectExpr("sum(s) AS s", "sum(n) AS n")
    )


def _calibrate_sustained(spark) -> float:
    # ONE timed pass, no warm-up, no min-of-3: the point is average
    # throughput over a long window (the window self-averages; JIT and
    # footer costs are <1% of 30s), and three passes would add ~90s to
    # every bench run for no extra signal on this axis.
    t0 = time.perf_counter()
    _calibration_sustained_df(spark).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _calibrate(spark) -> float:
    _calibration_df(spark).write.format("noop").mode("overwrite").save()
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _calibration_df(spark).write.format("noop").mode("overwrite").save()
        calib = min(calib, time.perf_counter() - t0)
    return calib


def _calibrate_shuffle(spark) -> float:
    _calibration_shuffle_df(spark).write.format("noop").mode("overwrite").save()
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _calibration_shuffle_df(spark).write.format("noop").mode(
            "overwrite"
        ).save()
        calib = min(calib, time.perf_counter() - t0)
    return calib


def isolate_main(names: list[str], sustained: bool = True) -> None:
    """Fresh-JVM-per-query mode (VERDICT r6 #4): each query is measured in
    its own subprocess with its own SparkSession, so a suspected mover can
    be separated from suite-position/GC effects by inspection. The td2
    isolation study (SCALING.md "Bench methodology") showed sub-2s queries
    swing ~2x with host contention; this mode plus the per-run calibration
    row is the standing tool for adjudicating such movers.
    """
    import subprocess

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    out: dict[str, dict[str, float]] = {}
    for name in names:
        # --no-sustained (ADVICE r9): the sustained row is ~30s nominal
        # (57-174s measured on degraded hosts) PER child JVM — isolating
        # many queries pays that once per query. Keep it by default
        # (SCALING.md uses per-isolate sustained data as the drift
        # signal) but let a many-query isolate opt out.
        cmd = [sys.executable, str(Path(__file__).resolve()),
               "--isolated-one", name]
        if not sustained:
            cmd.append("--no-sustained")
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            check=True,
        )
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        out[name] = {
            "sec": row["sec"],
            "cold_sec": row.get("cold_sec", -1.0),
            "calibration_sec": row["calibration_sec"],
            "calibration_shuffle_sec": row.get("calibration_shuffle_sec", -1.0),
            "calibration_sustained_sec": row.get("calibration_sustained_sec", -1.0),
            # same normalization as the suite headline; -1 with
            # --no-sustained (reader falls back to raw sec)
            "sec_per_sustained": _normalize_by_sustained(
                row["sec"], row.get("calibration_sustained_sec", -1.0)
            ),
        }
    print(
        json.dumps(
            {
                "metric": "isolated_fresh_jvm",
                "unit": "sec",
                "queries": out,
                "sf": sf,
            }
        )
    )


def isolated_one_main(name: str, sustained: bool = True) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"bench-isolate-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    calib = _calibrate(spark)
    calib_shuffle = _calibrate_shuffle(spark)
    calib_sustained = _calibrate_sustained(spark) if sustained else -1.0
    sec, cold = _bench_one(spark, name, sf_dir)
    print(
        json.dumps(
            {
                "query": name,
                "sec": round(sec, 3),
                # round-13 addition: the timed warm-up (cache-fill) pass
                "cold_sec": round(cold, 3),
                "calibration_sec": round(calib, 3),
                "calibration_shuffle_sec": round(calib_shuffle, 3),
                "calibration_sustained_sec": round(calib_sustained, 3),
            }
        )
    )
    spark.stop()


def main(sustained: bool = True) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qmap = catalog.queries()
    names = [n for n in BENCH_QUERIES if n in qmap]

    # Fixed CPU-bound calibration (see _calibration_df), timed with the same
    # protocol: a pure codegen aggregate over a literal range, no I/O, no
    # data dependence. Cross-round comparisons divide by this — the box's
    # effective speed varies run-to-run (host contention / frequency
    # scaling; a uniform 1.4x swing across byte-identical queries was
    # measured in round 4), and the calibration row lets a reader separate
    # machine drift from code drift.
    # Steady-state protocol: one untimed warm-up pass per query (parquet
    # footers, broadcast relations, codegen JIT), then MIN of three timed
    # passes. Min-of-3 (raised from 2 in round 4) is the noise methodology:
    # the r3 "drift" on q17/q18/q19 (1.4-1.5x vs r1 with byte-identical
    # code) was single-sample JVM noise — min over more passes bounds the
    # suite-position/GC effect a one-shot measurement can't. Cold-start is
    # a fixed cost amortized over a real deployment's lifetime; the suite
    # measures operator throughput, not JVM warmup.
    # Round-13 measurement ADDITION (VERDICT r12 item 4): the warm-up pass
    # is now TIMED and reported as the per-query COLD number. Operators
    # that persist() an intermediate pay the cache fill here, and the
    # min-of-3 steady-state passes below read it warm — both numbers are
    # now visible, so persist-based wins can't overstate themselves. The
    # min-of-3 protocol and its numbers are UNCHANGED (the comparable
    # cross-round series); cold numbers are a new, additional series.
    # (Cold includes first-touch costs: parquet footers, codegen JIT,
    # broadcast builds — honest for a fresh-deployment pass, noisy for
    # the first few queries while the JVM itself warms.)
    cold: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)

    calib = _calibrate(spark)
    calib_shuffle = _calibrate_shuffle(spark)
    # --no-sustained skips the ~30s (nominal) sustained row; the -1
    # sentinel flows through _normalize_by_sustained so readers fall back
    # to the raw numbers (ADVICE r10: the flag previously reached only
    # the isolate modes — a full-suite `--no-sustained` was silently
    # ignored).
    calib_sustained = _calibrate_sustained(spark) if sustained else -1.0

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    stable26 = round(sum(timings[n] for n in STABLE_26 if n in timings), 3)

    # The external driver keeps only the LAST ~2000 chars of stdout and
    # parses the final line as JSON. Round 4's final line carried all 125
    # per-query timings (~4 kB) and silently failed to parse — the round
    # published no bench number. So: the FULL map goes to its own earlier
    # stdout line and a committable file; the FINAL line is the compact
    # headline (top-10 slowest only, < ~700 bytes) and must stay that way.
    cold_total = round(sum(cold.values()), 3)
    stable26_cold = round(sum(cold[n] for n in STABLE_26 if n in cold), 3)
    full = {
        "metric": "headline_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # round-13 addition: the timed warm-up (cold, cache-fill) pass per
        # query — NOT comparable to pre-r13 rounds (which did not report
        # it); "queries"/min-of-3 remains the comparable series
        "queries_cold": cold,
        "cold_total_sec": cold_total,
        "sf": sf,
        "stable26_sec": stable26,
        "stable26_cold_sec": stable26_cold,
        "calibration_sec": round(calib, 3),
        "calibration_shuffle_sec": round(calib_shuffle, 3),
        "calibration_sustained_sec": round(calib_sustained, 3),
        "stable26_per_sustained": _normalize_by_sustained(
            stable26, calib_sustained
        ),
        "total_per_sustained": _normalize_by_sustained(total, calib_sustained),
        "n_queries": len(timings),
    }
    print(json.dumps(full))
    with open(Path(__file__).resolve().parent / "bench_full.json", "w") as f:
        json.dump(full, f, indent=1)

    print(
        compact_line(
            timings,
            sf,
            stable26,
            calib,
            calib_shuffle,
            calib_sustained,
            cold_total,
            stable26_cold,
        )
    )
    spark.stop()


if __name__ == "__main__":
    # argparse (ADVICE r10): the old hand-rolled scan only saw
    # --no-sustained at argv[3:] and only in the isolate modes, and any
    # unrecognized flag anywhere was silently ignored. Now every mode
    # honors --no-sustained and unknown flags are a hard error.
    import argparse

    _ap = argparse.ArgumentParser(
        description="Time the headline catalog queries at "
        "$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]; final stdout "
        "line is the compact JSON headline the external driver parses."
    )
    _mode = _ap.add_mutually_exclusive_group()
    _mode.add_argument(
        "--isolate", metavar="NAMES", default=None,
        help="comma-separated query names, each timed in its own fresh "
        "JVM subprocess (suite-position/GC adjudication mode)",
    )
    _mode.add_argument(
        "--isolated-one", metavar="NAME", default=None,
        help="internal: single-query child of --isolate",
    )
    _ap.add_argument(
        "--no-sustained", action="store_true",
        help="skip the ~30s-nominal sustained calibration row; the "
        "normalized fields carry the -1 sentinel and readers fall back "
        "to raw seconds",
    )
    _args = _ap.parse_args()
    # `is not None`, not truthiness: `--isolate ""` must error, not
    # silently fall through to the full multi-minute suite (review
    # round-11)
    if _args.isolate is not None:
        _names = [n.strip() for n in _args.isolate.split(",") if n.strip()]
        if not _names:
            _ap.error("--isolate requires at least one query name")
        isolate_main(_names, sustained=not _args.no_sustained)
    elif _args.isolated_one is not None:
        if not _args.isolated_one.strip():
            _ap.error("--isolated-one requires a query name")
        isolated_one_main(_args.isolated_one, sustained=not _args.no_sustained)
    else:
        main(sustained=not _args.no_sustained)
