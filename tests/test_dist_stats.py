"""Unit semantics for the distribution/quality operators (histogram,
winsorize, CUSUM drift, sampled quantiles, constraint profile) on
hand-built frames; the catalog oracle re-checks the same ops at
sf0.001/0.01."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


def test_histogram_bins_and_edges(spark):
    from bioeco_portal_etl_spark.operators.stats import equi_width_histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]], "v double"
    )
    out = {r["bin"]: r.asDict() for r in equi_width_histogram(df, "v", nbins=5).collect()}
    # values 0..9 in cents: 0..900, span 901; each bin gets 2 values
    assert len(out) == 5
    assert all(r["n_rows"] == 2 for r in out.values())
    assert out[0]["lo_e"] == 0
    assert out[4]["hi_e"] == 900
    # edges tile the span without gaps
    bins = [out[i] for i in range(5)]
    for a, b in zip(bins, bins[1:]):
        assert b["lo_e"] == a["hi_e"] + 1


def test_histogram_max_value_lands_in_last_bin(spark):
    from bioeco_portal_etl_spark.operators.stats import equi_width_histogram

    df = spark.createDataFrame([(0.0,), (10.0,)], "v double")
    out = {r["bin"]: r["n_rows"] for r in equi_width_histogram(df, "v", nbins=4).collect()}
    assert out == {0: 1, 3: 1}


def test_winsorize_caps_outlier(spark):
    from bioeco_portal_etl_spark.operators.stats import winsorize_stats

    # 19 values of 1.00 and one 1000.00 outlier: p95 rank = ceil(.95*20)=19
    rows = [("a", 1.0)] * 19 + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize_stats(df, "g", "v", p_lo=5, p_hi=95).collect()[0]
    assert out["lo_e"] == 100 and out["hi_e"] == 100
    assert out["win_sum_e"] == 20 * 100  # outlier clamped to 1.00
    assert out["win_mean_e"] == 100


def test_cusum_flags_shifted_key_only(spark):
    from bioeco_portal_etl_spark.operators.drift import cusum_drift

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # key "steady" hovers at the global mean; key "drift" runs high
    for i in range(10):
        eid += 1
        rows.append(("steady", base + dt.timedelta(minutes=i), eid, 10.0))
    for i in range(10):
        eid += 1
        rows.append(("drift", base + dt.timedelta(minutes=i), eid, 20.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    # global mean = 15.00 -> steady walks -500 per step, drift +500
    out = {
        r["key"]: r.asDict()
        for r in cusum_drift(df, "k", "ts", "id", "v", threshold_e=2200).collect()
    }
    assert out["drift"]["first_cross_id"] == 15  # 5th drift event: +2500
    assert out["steady"]["first_cross_id"] == 5  # symmetric negative drift
    assert out["drift"]["max_abs_cusum_e"] == 5000


def test_sampled_quantiles_exact_on_kept_rows(spark):
    import math

    from bioeco_portal_etl_spark.sketches.sampleq import sampled_quantiles

    rows = [("g", i, float(i)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = sampled_quantiles(df, "g", "id", "v", qs=(50,), bits=2).collect()[0]
    # reproduce the deterministic md5 sample driver-side: same rows kept
    sample_vals = sorted(
        int(v * 100) for (_, i, v) in rows if _md5_mod(i, 4) == 0
    )
    assert out["n_sample"] == len(sample_vals) > 0
    # value at nearest-rank ceil(50*n/100) among the kept rows
    k = math.ceil(50 * out["n_sample"] / 100)
    assert out["p50_e"] == sample_vals[k - 1]


def _md5_mod(i: int, m: int) -> int:
    import hashlib

    h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    return h % m


def test_profile_checks_one_pass_report(spark):
    from bioeco_portal_etl_spark.operators.quality import (
        completeness,
        profile_checks,
        uniqueness_gap,
        violations,
    )

    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, None, -1.0), (2, "y", 3.0)],
        "id long, name string, amount double",
    )
    out = {
        r["check"]: r["value"]
        for r in profile_checks(
            df,
            {
                "n_rows": F.count(F.lit(1)),
                "null_name": completeness("name"),
                "dup_id": uniqueness_gap("id"),
                "nonpositive_amount": violations(F.col("amount") > 0),
            },
        ).collect()
    }
    assert out == {
        "n_rows": 3,
        "null_name": 1,
        "dup_id": 1,
        "nonpositive_amount": 1,
    }


def test_profile_checks_rejects_unsafe_names(spark):
    """Check names are interpolated into a stack() SQL string, so anything
    outside [A-Za-z0-9_]+ must be rejected up front (round-4 ADVICE) —
    not parsed into a malformed report."""
    import pytest

    from bioeco_portal_etl_spark.operators.quality import profile_checks

    df = spark.createDataFrame([(1,)], "id long")
    for bad in ("n'rows", "a`b", "x y", "semi;colon", ""):
        with pytest.raises(ValueError, match="check names"):
            profile_checks(df, {bad: F.count(F.lit(1))})
