"""K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002; the
"KMV synopsis" of Beyer et al., SIGMOD 2007).

Estimate the number of distinct values per group from only the k smallest
hash values: if the k-th smallest of D uniform draws on [0, 1) sits at
R_k, then D ~ (k-1)/R_k (unbiased). Per-group state is k longs — constant,
broadcastable, mergeable — where an exact COUNT(DISTINCT) shuffles every
distinct value.

Plan shape (scale path first):
  1. ``groupBy(group, h)`` distinct — map-side combine collapses repeats
     before the one shuffle; the shuffle carries distinct hashes only.
  2. top-k smallest per group via ``row_number`` over (group ORDER BY h) —
     a sort of the *distinct-hash* set, spillable, never a collect.
  3. one tiny agg: count + max(h) over the kept k rows -> estimate.

Estimator arithmetic is engine-exact: hashes are 60-bit md5 prefixes
(integers), and the estimate is ``floor((k-1) * 2^60 / R_k)`` computed in
doubles where ``(k-1) * 2^60`` rounds once (2^60 is a power of two, exactly
representable) and the division rounds once — both IEEE-correctly-rounded,
so DuckDB reproduces the exact same long. Groups with fewer than k distinct
hashes short-circuit to their exact count (the sketch IS exact below k).

The reference (iobis/bioeco-portal-etl) has no sketch surface — its
notebook counts distinct programmes exactly (notebooks/index.Rmd:169) at
df-in-memory scale; this is the 100 TB replacement for that pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from bioeco_portal_etl_spark.sketches import H60_DOMAIN, h60


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    k: int = 64,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns one row per group: ``group_cols + [out_col]``. ``k`` trades
    state for accuracy (stderr ~ 1/sqrt(k-2); k=64 -> ~13%).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = df.select(*group_cols, h60(v.cast("string")).alias("__h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__rk")
    )
    # < k distinct hashes seen -> the sketch holds the full set: exact.
    est = F.when(F.col("__n") < k, F.col("__n")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(float(H60_DOMAIN)) / F.col("__rk")
        ).cast("long")
    )
    return agg.select(*group_cols, est.cast("long").alias(out_col))


def duck_kmv_distinct(
    table: str, group_expr: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB CTE body mirroring :func:`kmv_distinct`: exposes
    ``kmv(grp, est_distinct)``. Embed inside ``WITH``."""
    from bioeco_portal_etl_spark.sketches import duck_h60

    return f"""
hashed AS (
  SELECT DISTINCT {group_expr} AS grp,
         {duck_h60(f"CAST({value_expr} AS VARCHAR)")} AS h
  FROM {table}
),
kept AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed
),
kmv AS (
  SELECT grp,
         CASE WHEN count(*) < {k} THEN count(*)
              ELSE CAST(floor({float(k - 1)} * {float(H60_DOMAIN)} / max(h)) AS BIGINT)
         END AS est_distinct
  FROM kept WHERE rn <= {k} GROUP BY grp
)"""


def kmv_set_ops(
    df_a: DataFrame, df_b: DataFrame, value_col: str, k: int = 64
) -> DataFrame:
    """Distinct-union and intersection estimates for two key sets from their
    MERGED KMV sketch (Beyer et al., SIGMOD 2007): the k smallest hashes of
    A ∪ B are exactly the k smallest of (sketch_A ∪ sketch_B), so two
    already-built k-long sketches answer union/intersection/Jaccard without
    revisiting the data — the property that lets a 100 TB profile keep one
    sketch per partition/day and compose overlap reports later.

    est_union = the standard KMV estimate on the merged sketch;
    est_intersection = round-free ``floor(n_both * est_union / k)`` where
    n_both counts merged-sketch hashes present in BOTH inputs (the Jaccard
    fraction scaled by the union size — one IEEE multiply+divide on exact
    integers, engine-identical).

    One row out: (est_union, est_intersection).
    """
    v = F.col(value_col)
    # per-side sketches FIRST (sort+limit lowers to TakeOrdered — a
    # distributed top-k, no single-partition sort of the full hash set);
    # the merge then touches <= 2k rows.
    ha = (
        df_a.select(h60(v.cast("string")).alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(k)
        .withColumn("__in_a", F.lit(1))
        .withColumn("__in_b", F.lit(0))
    )
    hb = (
        df_b.select(h60(v.cast("string")).alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(k)
        .withColumn("__in_a", F.lit(0))
        .withColumn("__in_b", F.lit(1))
    )
    both = (
        ha.unionByName(hb)
        .groupBy("__h")
        .agg(F.max("__in_a").alias("__in_a"), F.max("__in_b").alias("__in_b"))
    )
    kept = both.orderBy("__h").limit(k)
    agg = kept.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("__h").alias("__rk"),
        F.sum(F.col("__in_a") * F.col("__in_b")).alias("__n_both"),
    )
    est_union = F.when(F.col("__n") < k, F.col("__n")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(float(H60_DOMAIN)) / F.col("__rk")).cast(
            "long"
        )
    )
    return agg.select(
        est_union.cast("long").alias("est_union"),
        F.floor(F.col("__n_both") * est_union / F.col("__n"))
        .cast("long")
        .alias("est_intersection"),
    )


def duck_kmv_set_ops(
    table_a: str, table_b: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB CTE body mirroring :func:`kmv_set_ops`; exposes
    ``kmvset(est_union, est_intersection)``."""
    from bioeco_portal_etl_spark.sketches import duck_h60

    h = duck_h60(f"CAST({value_expr} AS VARCHAR)")
    return f"""
ha AS (
  SELECT h, 1 AS in_a, 0 AS in_b FROM (
    SELECT DISTINCT {h} AS h FROM {table_a}
  ) ORDER BY h LIMIT {k}
),
hb AS (
  SELECT h, 0 AS in_a, 1 AS in_b FROM (
    SELECT DISTINCT {h} AS h FROM {table_b}
  ) ORDER BY h LIMIT {k}
),
both_m AS (
  SELECT h, max(in_a) AS in_a, max(in_b) AS in_b
  FROM (SELECT * FROM ha UNION ALL SELECT * FROM hb)
  GROUP BY h ORDER BY h LIMIT {k}
),
kagg AS (
  SELECT count(*) AS n, max(h) AS rk, sum(in_a * in_b) AS n_both FROM both_m
),
kmvset AS (
  SELECT CASE WHEN n < {k} THEN n
              ELSE CAST(floor({float(k - 1)} * {float(1 << 60)} / rk) AS BIGINT)
         END AS est_union,
         CAST(floor(n_both * (CASE WHEN n < {k} THEN n
              ELSE CAST(floor({float(k - 1)} * {float(1 << 60)} / rk) AS BIGINT)
         END) / n) AS BIGINT) AS est_intersection
  FROM kagg
)"""
