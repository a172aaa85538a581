"""Invariant + partition-invariance properties for the round-4 operators
(SURVEY.md §5.2 conventions): results must be identical under adversarial
repartitioning, and structural invariants must hold on real data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE


def _sig(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _scrambled(df):
    return df.repartition(13, F.col(df.columns[0])).sortWithinPartitions(
        F.col(df.columns[0]).desc()
    )


@pytest.fixture(scope="module")
def events(spark):
    return read_parquet_table(spark, SF_SMOKE, "events")


@pytest.fixture(scope="module")
def lineitem(spark):
    return read_parquet_table(spark, SF_SMOKE, "lineitem")


def test_attribution_partition_invariant(spark, events):
    from bioeco_portal_etl_spark.operators.attribution import (
        attribute_conversions,
    )

    args = ("user_id", "ts", "event_type", "value", "purchase")
    a = attribute_conversions(events, *args)
    b = attribute_conversions(_scrambled(events), *args)
    assert _sig(a) == _sig(b)


def test_cusum_partition_invariant(spark, events):
    from bioeco_portal_etl_spark.operators.drift import cusum_drift

    args = ("user_id", "ts", "event_id", "value", 20000)
    a = cusum_drift(events, *args)
    b = cusum_drift(_scrambled(events), *args)
    assert _sig(a) == _sig(b)


def test_ewma_partition_invariant(spark, events):
    from bioeco_portal_etl_spark.operators.timeseries import ewma

    args = ("user_id", "ts", "event_id", "value")
    a = ewma(events, *args)
    b = ewma(_scrambled(events), *args)
    assert _sig(a) == _sig(b)


def test_cohort_invariants(spark, events):
    from bioeco_portal_etl_spark.operators.cohorts import cohort_retention

    rows = cohort_retention(events, "user_id", "ts", "2024-01-01").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_active"] <= r["cohort_size"]
        assert 0 <= r["retention_e4"] <= 10000
        if r["week_offset"] == 0:
            # everyone is active in their own first week
            assert r["n_active"] == r["cohort_size"]
            assert r["retention_e4"] == 10000


def test_transitions_row_stochastic(spark, events):
    from bioeco_portal_etl_spark.operators.transitions import (
        markov_transitions,
    )

    rows = markov_transitions(
        events, "user_id", "ts", "event_type", "event_id"
    ).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    for src, rs in by_src.items():
        total = sum(r["cnt"] for r in rs)
        # floor quantization loses < 1 ulp-e4 per cell
        p_sum = sum(r["p_e4"] for r in rs)
        assert 10000 - len(rs) < p_sum <= 10000, (src, p_sum)


def test_histogram_partitions_tile_and_count(spark, lineitem):
    from bioeco_portal_etl_spark.operators.stats import equi_width_histogram

    total = lineitem.count()
    rows = sorted(
        equi_width_histogram(lineitem, "l_extendedprice", nbins=16).collect(),
        key=lambda r: r["bin"],
    )
    assert sum(r["n_rows"] for r in rows) == total
    for a, b in zip(rows, rows[1:]):
        assert b["lo_e"] == a["hi_e"] + 1  # edges tile, no gaps/overlap


def test_winsorize_bounds_hold(spark, lineitem):
    from bioeco_portal_etl_spark.operators.stats import winsorize_stats

    for r in winsorize_stats(lineitem, "l_returnflag", "l_extendedprice").collect():
        assert r["lo_e"] <= r["hi_e"]
        assert r["lo_e"] <= r["win_mean_e"] <= r["hi_e"]
        assert r["win_sum_e"] <= r["n_rows"] * r["hi_e"]
        assert r["win_sum_e"] >= r["n_rows"] * r["lo_e"]


def test_containment_bounds_and_symmetry(spark):
    from bioeco_portal_etl_spark.sources.files import read_parquet_table
    from bioeco_portal_etl_spark.text.dedupe import containment_pairs

    docs = read_parquet_table(spark, SF_SMOKE, "documents")
    for r in containment_pairs(docs, "doc_id", "text").collect():
        assert r["id_a"] < r["id_b"]
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["cont_a_e4"] <= 10000 and 0 <= r["cont_b_e4"] <= 10000
        assert max(r["cont_a_e4"], r["cont_b_e4"]) >= 8000


def test_mmr_is_permutation_of_shortlist_head(spark):
    """MMR over identical vectors with lam=10000 (pure relevance) must
    reduce to the plain top-k ranking — the boundary case separating the
    diversity term from the relevance term."""
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk
    from bioeco_portal_etl_spark.similarity.rerank import mmr_rerank

    emb = read_parquet_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    mmr = mmr_rerank(
        emb, q, "embedding", "vec_id", k_shortlist=10, k_select=5, lam_e4=10000
    )
    top = cosine_topk(emb, q, "embedding", "vec_id", k=5)
    got = sorted(
        (r["query_id"], r["sel_rank"], r["match_id"]) for r in mmr.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["match_id"]) for r in top.collect()
    )
    assert got == want
