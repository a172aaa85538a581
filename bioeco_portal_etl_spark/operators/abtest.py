"""Two-proportion A/B test report — the experimentation readout.

Given per-row (variant, converted) facts, emit the canonical two-sample
proportion comparison: per-variant rates, absolute lift, and the pooled
two-proportion z statistic

    z = (pA - pB) / sqrt( p*(1-p) * (1/nA + 1/nB) ),  p = (cA+cB)/(nA+nB)

ONE partial-combinable aggregate over the facts (four integers: nA, cA,
nB, cB) and a constant-size projection — the statistic costs a scan, so
running it per-segment or per-day is the same plan with more group keys.

Exactness: counts and e6 rates are integers; z follows with a short IEEE
(+,-,*,/,sqrt) chain on those exact integers — both engines round each
step identically (the rolling_zscore argument) — and surfaces as
floor-e4. The significance flag compares z_e4 against the integer
two-sided 5% critical value (|z| >= 1.9600 -> 19600), so the decision
column never touches floats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ab_test_report(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    variant_a: str = "A",
    variant_b: str = "B",
) -> DataFrame:
    """One-row report: (n_a, conv_a, rate_a_e6, n_b, conv_b, rate_b_e6,
    lift_e6, z_e4, significant). ``converted_col`` must be 0/1-valued
    (cast from bool upstream)."""
    is_a = F.col(variant_col) == variant_a
    is_b = F.col(variant_col) == variant_b
    agg = df.agg(
        F.sum(is_a.cast("long")).alias("n_a"),
        F.sum(F.when(is_a, F.col(converted_col)).otherwise(0)).alias("conv_a"),
        F.sum(is_b.cast("long")).alias("n_b"),
        F.sum(F.when(is_b, F.col(converted_col)).otherwise(0)).alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    # guard the degenerate cases EXPLICITLY: an absent variant (n = 0)
    # makes `div` throw under an ANSI session (Spark 4's default) and
    # turns pa/pb into double NaN whose floor->long cast ALSO throws
    # there; se = 0 (all-convert / none-convert) is the same NaN-cast
    # hazard. Each NULL below is intentional, not a cast accident.
    # Doubles themselves never throw (IEEE Inf/NaN), so the condition is
    # safe to evaluate even when a count is zero.
    nonzero = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    z_e4 = (
        F.when(nonzero & (se > 0), F.floor((pa - pb) / se * 10000))
        .otherwise(F.lit(None))
        .cast("long")
    )
    rate_a = F.expr(
        "CASE WHEN n_a > 0"
        " THEN CAST((1000000 * conv_a) div n_a AS BIGINT) END"
    )
    rate_b = F.expr(
        "CASE WHEN n_b > 0"
        " THEN CAST((1000000 * conv_b) div n_b AS BIGINT) END"
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        rate_a.alias("rate_a_e6"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        rate_b.alias("rate_b_e6"),
        (rate_a - rate_b).alias("lift_e6"),
        z_e4.alias("z_e4"),
        # degenerate experiments (se = 0: all-convert / none-convert) have
        # an undefined z (NULL) — "cannot prove an effect" maps to NOT
        # significant, never to a NULL verdict
        F.coalesce((F.abs(z_e4) >= 19600).cast("long"), F.lit(0))
        .cast("long")
        .alias("significant"),
    )


def duck_ab_test(source_sql: str, variant_a: str = "A", variant_b: str = "B") -> str:
    """DuckDB CTE body mirroring :func:`ab_test_report`; exposes
    ``ab(...)``. ``source_sql`` must project (variant, converted)."""
    return f"""__ab_agg AS (
  SELECT sum(CASE WHEN variant = '{variant_a}' THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN variant = '{variant_a}' THEN converted ELSE 0 END) AS conv_a,
         sum(CASE WHEN variant = '{variant_b}' THEN 1 ELSE 0 END) AS n_b,
         sum(CASE WHEN variant = '{variant_b}' THEN converted ELSE 0 END) AS conv_b
  FROM ({source_sql})
),
ab AS (
  SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
         CASE WHEN n_a > 0
              THEN CAST((1000000 * conv_a) // n_a AS BIGINT) END AS rate_a_e6,
         CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
         CASE WHEN n_b > 0
              THEN CAST((1000000 * conv_b) // n_b AS BIGINT) END AS rate_b_e6,
         CASE WHEN n_a > 0 AND n_b > 0 THEN
           CAST((1000000 * conv_a) // n_a AS BIGINT)
             - CAST((1000000 * conv_b) // n_b AS BIGINT) END AS lift_e6,
         CASE WHEN n_a > 0 AND n_b > 0 AND
              sqrt(((conv_a + conv_b) / (n_a + n_b))
                   * (1 - (conv_a + conv_b) / (n_a + n_b))
                   * (1 / n_a + 1 / n_b)) > 0 THEN
           CAST(floor((conv_a / n_a - conv_b / n_b)
                / sqrt(((conv_a + conv_b) / (n_a + n_b))
                       * (1 - (conv_a + conv_b) / (n_a + n_b))
                       * (1 / n_a + 1 / n_b)) * 10000) AS BIGINT) END AS z_e4,
         coalesce(CASE WHEN n_a > 0 AND n_b > 0 AND
              sqrt(((conv_a + conv_b) / (n_a + n_b))
                   * (1 - (conv_a + conv_b) / (n_a + n_b))
                   * (1 / n_a + 1 / n_b)) > 0 THEN
           abs(CAST(floor((conv_a / n_a - conv_b / n_b)
                / sqrt(((conv_a + conv_b) / (n_a + n_b))
                       * (1 - (conv_a + conv_b) / (n_a + n_b))
                       * (1 / n_a + 1 / n_b)) * 10000) AS BIGINT)) >= 19600
           END, false)::BIGINT AS significant
  FROM __ab_agg
)"""
