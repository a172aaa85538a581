"""Bucketed-layout contracts: co-located joins and aggs skip the shuffle.

These are plan tests in the spirit of tests/test_plans.py — the point of
bucketing is WHAT THE PLAN OMITS (Exchange nodes), so the assertion is on
the physical plan, with a value check to prove results are unchanged."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioeco_portal_etl_spark.operators.bucketed import read_bucketed, write_bucketed
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    l = read_parquet_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = read_parquet_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(l, "bkt_lineitem", ["l_orderkey"], 8, path=str(root / "l"))
    write_bucketed(o, "bkt_orders", ["o_orderkey"], 8, path=str(root / "o"))
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """With auto-broadcast off (tiny test tables would otherwise broadcast
    and mask the layout), the fact-to-fact plan this models at 100 TB is a
    SortMergeJoin reading both bucketed scans directly — zero
    hash-repartition Exchanges anywhere below the final non-key agg."""
    lt, ot = bucketed_tables
    l, o = read_bucketed(spark, lt), read_bucketed(spark, ot)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "SelectedBucketsCount" in plan
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    l = read_bucketed(spark, lt)
    agg = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty")
    )
    assert "Exchange" not in _plan(agg)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, ot = bucketed_tables
    l, o = read_bucketed(spark, lt), read_bucketed(spark, ot)
    bucketed = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pl = read_parquet_table(spark, SF_SMOKE, "lineitem")
    po = read_parquet_table(spark, SF_SMOKE, "orders")
    plain = (
        pl.join(po, pl.l_orderkey == po.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_write_bucketed_validates_params(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        write_bucketed(df, "t", [], 4)
    with pytest.raises(ValueError):
        write_bucketed(df, "t", ["id"], 0)
