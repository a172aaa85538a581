"""Regression lock for the round-9 conversion-determinism conventions
(PORTABILITY.md "Conversion determinism", ADVICE r8).

Two traps, each proven by CONSTRUCTING the input that splits the engines
under the old spelling and asserting the fixed spelling agrees:

1. q20-class: Spark's double->long CAST truncates toward zero while
   DuckDB's rounds half-to-even — invisible on integral doubles, live on
   fractional ones. The fixed form floors explicitly on both sides.
2. q11-class: `value > total / n` in doubles lets a boundary row flip on
   division rounding; the fixed form cross-multiplies in exact decimal.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


# fractional quantities chosen to split truncate-toward-zero from
# round-half-to-even: 2.5 (trunc 2 / rhe 2), 3.5 (trunc 3 / rhe 4),
# 2.7 (trunc 2 / rhe 3), -2.5 (trunc -2 / rhe -2), -2.7 (trunc -2 / rhe -3)
_FRACTIONAL = [2.5, 3.5, 2.7, -2.5, -2.7, 4.0]


def test_old_q20_spelling_diverges_on_fractional_quantities(spark, duck):
    """The trap is REAL: the pre-round-9 spellings disagree on these
    inputs (this is the assertion that would have caught q20 had any
    fractional quantity existed)."""
    df = spark.createDataFrame([(v,) for v in _FRACTIONAL], "q double")
    spark_old = df.agg(F.sum(F.col("q").cast("long")).alias("s")).collect()[0]["s"]
    duck_old = duck.execute(
        "SELECT sum(CAST(q AS BIGINT)) FROM (SELECT unnest(?) AS q)",
        [_FRACTIONAL],
    ).fetchone()[0]
    # Spark truncates: 2+3+2-2-2+4 = 7; DuckDB rounds half-to-even:
    # 2+4+3-2-3+4 = 8
    assert spark_old == 7 and duck_old == 8
    assert spark_old != duck_old


def test_fixed_q20_spelling_agrees_on_fractional_quantities(spark, duck):
    """floor() before the integer conversion is defined identically on
    both engines — the q20 fix generalizes to ANY fractional input."""
    df = spark.createDataFrame([(v,) for v in _FRACTIONAL], "q double")
    spark_new = df.agg(F.sum(F.floor("q")).alias("s")).collect()[0]["s"]
    duck_new = duck.execute(
        "SELECT sum(CAST(floor(q) AS BIGINT)) FROM (SELECT unnest(?) AS q)",
        [_FRACTIONAL],
    ).fetchone()[0]
    # floor on both: 2+3+2-3-3+4 = 5
    assert spark_new == duck_new == 5


def test_cross_multiplied_decimal_compare_is_division_free(spark, duck):
    """q11-class boundary: a supplier whose exact share EQUALS the mean
    must be excluded by `>` on BOTH engines. The cross-multiplied decimal
    form guarantees it; a double `value > total/n` depends on how the
    division rounds (total/n is not representable when total = 0.3-like
    decimals), which is the flip the fix removes."""
    # three equal values: every row's value * 3 == total exactly -> no row
    # passes `value * n > total` under exact arithmetic
    rows = [(1, "0.100001"), (2, "0.100001"), (3, "0.100001")]
    df = spark.createDataFrame(rows, "k int, v string").select(
        "k", F.col("v").cast("decimal(18,6)").alias("v")
    )
    tot = df.agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    passed = (
        df.crossJoin(F.broadcast(tot))
        .filter(F.col("v") * F.col("n") > F.col("total"))
        .count()
    )
    duck_passed = duck.execute(
        """
        WITH v AS (SELECT CAST(x AS DECIMAL(18,6)) AS v
                   FROM (SELECT unnest(['0.100001','0.100001','0.100001']) AS x))
        SELECT count(*) FROM v
        WHERE v * (SELECT count(*) FROM v) > (SELECT sum(v) FROM v)
        """
    ).fetchone()[0]
    assert passed == duck_passed == 0


def test_decimal_product_precision_headroom(spark):
    """The cross-multiplied form must stay EXACT at cluster scale: Spark
    keeps scale 6 when decimal(28,6) * bigint exceeds precision 38 (the
    adjusted type is decimal(38,6), truncating INTEGER headroom, not
    fractional digits). Pin the resulting type so a Spark upgrade that
    changes the precision-loss rule fails loudly here."""
    df = spark.createDataFrame([("1234567890123.123456", 1000000)],
                               "v string, n long").select(
        F.col("v").cast("decimal(28,6)").alias("v"), "n"
    )
    out = df.select((F.col("v") * F.col("n")).alias("p"))
    assert out.schema["p"].dataType.simpleString() == "decimal(38,6)"
    got = out.collect()[0]["p"]
    assert str(got) == "1234567890123123456.000000"
