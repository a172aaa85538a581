"""Salted aggregation: identical results to the direct groupBy on skewed
data, with the hot key split across (key, salt) reducers."""

from __future__ import annotations

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.operators.skew import SALT_COL, salted_agg, with_salt


def _skewed(spark):
    hot = spark.range(20000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.union(cold)


def test_salted_agg_matches_direct(spark):
    df = _skewed(spark)
    direct = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )
    salted = salted_agg(
        df,
        ["k"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "s": (F.sum("v"), F.sum("s")),
            "mx": (F.max("v"), F.max("mx")),
            "mn": (F.min("v"), F.min("mn")),
        },
    )
    d = {r.k: (r.n, r.s, r.mx, r.mn) for r in direct.collect()}
    s = {r.k: (r.n, r.s, r.mx, r.mn) for r in salted.collect()}
    assert d == s


def test_salt_splits_hot_key(spark):
    df = with_salt(_skewed(spark), buckets=16)
    hot_salts = df.filter(F.col("k") == "hot").select(SALT_COL).distinct().count()
    assert hot_salts == 16  # the hot key fans out across all salt buckets
