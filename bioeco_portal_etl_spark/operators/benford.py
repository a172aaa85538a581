"""Benford first-digit distribution audit — anomaly screening for numeric
fact columns.

Naturally-occurring multi-magnitude quantities (transaction amounts, file
sizes, populations) follow Benford's law: leading digit d appears with
probability log10(1 + 1/d) (Newcomb 1881 / Benford 1938 — public result).
Fabricated, truncated, or systematically-generated values deviate, which
is why the first-digit test is a standard forensic/data-quality screen.
At 100 TB the audit is one scan + a 9-key groupBy — map-side partial
aggregation reduces each partition to ≤9 rows before the shuffle, so the
cost is the scan alone.

Cross-engine exactness: the leading digit is taken from the DECIMAL STRING
of ``floor(x)`` cast to BIGINT (integer-to-string formatting is identical
everywhere), never via ``log10`` (whose half-ulp behavior at power-of-ten
boundaries differs between libm builds — see PORTABILITY.md). The expected
Benford shares are embedded as pre-floored e4 integer literals computed
once in Python, so neither engine evaluates a transcendental.

Reference parity: the reference's QA steps are row-count/duplicate audits
(SURVEY.md §2 A3); this operator extends the audit family to value
distributions.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# floor(log10(1 + 1/d) * 1e4) for d = 1..9, evaluated once here so both
# engines consume identical integer literals.
BENFORD_E4 = {
    d: math.floor(math.log10(1.0 + 1.0 / d) * 10000) for d in range(1, 10)
}


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Per-digit observed vs Benford-expected first-digit shares.

    Rows with ``value < 1`` are excluded (no stable leading digit in the
    integer part). Output per digit 1..9: observed count, observed share
    (e4-floored), expected share (e4 literal), and the signed deviation —
    all BIGINT, fully engine-portable."""
    from pyspark.sql import Window

    digits = (
        df.filter(F.col(value_col) >= 1)
        .select(
            F.substring(
                F.expr(f"CAST(CAST(floor({value_col}) AS BIGINT) AS STRING)"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    expected = F.create_map(
        *[x for d, e in BENFORD_E4.items() for x in (F.lit(d), F.lit(e))]
    )
    return (
        # grand total via an unpartitioned window over the <=9-row digit
        # table: no second scan of the fact table, no join; the "shuffle"
        # is a SinglePartition exchange of nine rows. 1e4 keeps the share
        # arithmetic in IEEE doubles on both engines (10000.0 would parse
        # as DECIMAL and round differently — PORTABILITY.md).
        digits.withColumn("total", F.sum("n").over(Window.partitionBy()))
        .withColumn(
            "obs_e4", F.expr("CAST(floor(n * 1e4 / total) AS BIGINT)")
        )
        .withColumn("exp_e4", expected[F.col("digit")].cast("long"))
        .withColumn("dev_e4", F.col("obs_e4") - F.col("exp_e4"))
        .select("digit", F.col("n").cast("long").alias("n"),
                "obs_e4", "exp_e4", "dev_e4")
    )


def benford_oracle_sql(source_sql: str, value_col: str) -> str:
    """The DuckDB mirror of :func:`benford_audit` over ``source_sql``."""
    values = ", ".join(f"({d}, {e})" for d, e in BENFORD_E4.items())
    return f"""
WITH src AS ({source_sql}),
dg AS (
  SELECT CAST(substr(CAST(CAST(floor({value_col}) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM src WHERE {value_col} >= 1
),
cnts AS (SELECT digit, count(*)::BIGINT AS n FROM dg GROUP BY digit),
tot AS (SELECT digit, n, sum(n) OVER () AS total FROM cnts),
exp(digit, exp_e4) AS (VALUES {values})
SELECT c.digit, c.n,
       CAST(floor(c.n * 1e4 / c.total) AS BIGINT) AS obs_e4,
       e.exp_e4::BIGINT AS exp_e4,
       (CAST(floor(c.n * 1e4 / c.total) AS BIGINT) - e.exp_e4)::BIGINT
         AS dev_e4
FROM tot c
JOIN exp e ON e.digit = c.digit
ORDER BY c.digit"""
