"""Catalog extension: TPC-H-class relational plans beyond q1/q3/q5/q6.

The reference's relational surface is equi-left-joins + plain groupBy
(SURVEY.md §2.5-2.6, notebooks/index.Rmd:98,313). A complete engine must
also cover the plan families every warehouse workload leans on: EXISTS /
NOT EXISTS (semi/anti joins), correlated scalar subqueries (decorrelated
into agg-joins), fraction-of-total HAVING (two-pass aggregate + broadcast
scalar), disjunctive multi-column predicates, and having-subquery fact
re-joins. Each entry is written as the plan we WANT at 100 TB — semi/anti
instead of join+distinct (no fan-out, no dedupe shuffle), decorrelated
aggregates instead of per-row subqueries, one-row scalars broadcast
instead of recomputed — and each is oracle-checked against DuckDB running
the classic subquery formulation, proving the rewrite preserves semantics.

Oracle-parity conventions (see also catalog.py): money sums cast to
decimal(18,6) BEFORE aggregation (reassociation-exact across engines);
ratios exposed as floor(x*1e4) longs; deterministic ORDER BY with id
tiebreaks.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

_DEC = "decimal(18,6)"


def q4_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> LEFT SEMI join (SURVEY.md §2.5 notes the
    reference has no semi joins; this is the first-class form of its
    has_shapefile lookup pattern, index.Rmd:425).

    Plan at scale: the semi join keeps orders-side cardinality (no fan-out
    on the ~4-lineitems-per-order multiplicity, no post-join distinct).
    The non-equi half of the condition (l_shipdate > o_orderdate) rides on
    the hash join on orderkey; the date-window filter is pushed to the
    orders parquet scan."""
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = T(spark, sf, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q11_value_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: fraction-of-total HAVING via a scalar subquery.

    Spark-first: aggregate once, derive the one-row total from the SAME
    aggregate (reused, not rescanned), broadcast-cross-join it back, and
    filter. At 100 TB the per-supplier aggregate is the only fact shuffle;
    the total is K rows -> 1 row. The threshold compare is cross-multiplied
    exact decimal (value * nsupp > grand_total) so no engine ever divides.

    The cut is ABOVE-MEAN share (fraction = 1/n_suppliers), the
    data-relative form of TPC-H's 0.0001/SF spec scaling (SF is
    proportional to supplier count): a FIXED fraction empties as the
    fleet grows — the round-8 sf0.1 oracle sweep caught the original
    0.005 returning zero rows once shares fell to ~1/1000."""
    l = T(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    per_supp = l.groupBy("l_suppkey").agg(F.sum(rev).alias("value"))
    total = per_supp.agg(
        F.sum("value").alias("grand_total"),
        F.count(F.lit(1)).alias("nsupp"),
    )
    # Cross-multiplied EXACT-decimal compare (value * nsupp > grand_total),
    # not value > grand_total/nsupp in doubles: a supplier landing on the
    # float boundary of an order-dependent double summation could flip
    # between engines/runs. Same convention as q20's 2*shipped*npairs >
    # 3*total_q form (ADVICE r8). Magnitudes fit decimal(38,6) with huge
    # headroom: grand_total*nsupp ~ 1e13 at sf0.1, ~1e19 only at SF~1e5.
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("value") * F.col("nsupp") > F.col("grand_total"))
        # surface as double on both engines (decimal stays internal); cast
        # BEFORE the sort so tie order under double rounding matches too
        .select("l_suppkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_suppkey")
    )


Q11_SQL = """
WITH v AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, value::DOUBLE AS value
FROM v
WHERE value * (SELECT count(*) FROM v) > (SELECT sum(value) FROM v)
ORDER BY value::DOUBLE DESC, l_suppkey
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio over a broadcast dim
    join — one pass, no self-join. Ratio exposed as floor(pct*1e4) long
    (engine-stable; round() flips on half-ulp disagreements)."""
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-09-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    p = T(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))).alias("promo"),
            F.sum(rev).alias("total"),
        )
    )
    return agg.select(
        F.floor(
            F.col("promo").cast("double") / F.col("total").cast("double") * 100 * 1e4
        ).alias("promo_pct_e4"),
        F.col("promo").cast("double").alias("promo_revenue"),
    )


Q14_SQL = """
SELECT CAST(floor(CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) * 100 * 1e4) AS BIGINT)
         AS promo_pct_e4,
       promo::DOUBLE AS promo_revenue
FROM (
  SELECT sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS promo,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON p_partkey  = l_partkey
  WHERE o_orderdate >= TIMESTAMP '1996-09-01' AND o_orderdate < TIMESTAMP '1996-10-01'
)
"""


def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part avg quantity)
    decorrelated into an aggregate + broadcast join — the rewrite Catalyst
    applies to the subquery form, written explicitly as the plan of record.

    The per-part threshold divides an EXACT decimal sum by the count in
    double, so the `<` compare cannot flip between engines. At scale the
    per-part aggregate shuffles K part keys (tiny vs the fact), then joins
    back broadcast."""
    p = T(spark, sf, "part").filter(F.col("p_brand") == "Brand#13")
    l = T(spark, sf, "lineitem")
    lp = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = lp.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
            * 0.2
        ).alias("qty_thr")
    )
    small = lp.join(thr, "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_thr")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        # decimal sum internally, double at the surface (gate convention)
        F.sum(F.col("l_extendedprice").cast(_DEC))
        .cast("double")
        .alias("total_price"),
    )


Q17_SQL = """
SELECT count(*) AS n_small,
       sum(CAST(l_extendedprice AS DECIMAL(18,6)))::DOUBLE AS total_price
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (
    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) * 0.2
    FROM lineitem l2
    JOIN part p2 ON p2.p_partkey = l2.l_partkey
    WHERE p2.p_brand = 'Brand#13' AND l2.l_partkey = l.l_partkey
  )
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery -> aggregate once, then join the
    qualifying keys back to the facts. The heavy groupBy(l_orderkey) runs
    once; qualifying keys (rare) broadcast back onto orders/customer —
    no IN-subquery re-evaluation, no second lineitem scan."""
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


Q18_SQL = """
SELECT c_name, o_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty::DOUBLE AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


def q19_disjunctive_pred(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    The part-side conjuncts cannot fully push below the join (each branch
    couples p_* with l_quantity), but the broadcast hash join on partkey
    keeps the disjunction a cheap post-join filter inside one codegen
    stage; Catalyst still prunes part to the 3 referenced columns."""
    l = T(spark, sf, "lineitem")
    p = T(spark, sf, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 25) & q.between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return j.filter(branch).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


Q19_SQL = """
SELECT count(*) AS n_items,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))::DOUBLE
         AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: global-scalar subquery + NOT EXISTS -> broadcast
    one-row threshold + LEFT ANTI join (adapted: "no orders since
    1999-01-01"; every customer in this dataset has SOME order). The anti
    join's right side is pre-filtered to the recent window before the
    join, so the probe is against the small recent-orders build."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS n_cust,
       sum(CAST(c_acctbal AS DECIMAL(18,6)))::DOUBLE AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                          / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


CATALOG_TPCH: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q4_priority_exists": (q4_priority_exists, Q4_SQL),
    "q11_value_suppliers": (q11_value_suppliers, Q11_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q19_disjunctive_pred": (q19_disjunctive_pred, Q19_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
}
