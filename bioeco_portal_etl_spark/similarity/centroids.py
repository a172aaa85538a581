"""Per-label embedding centroid statistics — the cluster-quality readout
an embedding-curation pipeline tracks per class/source/shard: how big is
each group, where is its center, and how tight is it (within-group
scatter). Feeds drift monitors (compare today's centroids to
yesterday's) and mislabel triage (high-variance labels first).

Plan shape: ONE posexplode of the vector column into (label, dim, value)
— a row-multiplying projection, not a shuffle — then a single
partial-combinable aggregate per (label, dim), then a per-label rollup
of dims rows each. No pairwise joins: within-group scatter around the
quantized centroid c uses Σ(x - c)² = Σx² - 2cΣx + nc², so the job is
two chained groupBys over an exploded frame — linear in rows × dims and
embarrassingly partial-aggregatable, exactly what survives 100 TB.

Exactness (two traps at once):
- cross-row float sums are partition-order-dependent, so every element
  is quantized to integer e4 BEFORE any aggregation
  (PORTABILITY.md: quantize-before-aggregating);
- int64 products of two sum-scale factors overflow silently (the
  round-5 assortativity postmortem), so the scatter is computed as
  sxx - 2·c·sx + n·c² — every factor bounded by value-scale · n, never
  (value-scale · n)² — instead of the textbook sxx - sx²/n whose sx²
  term wraps past n ≈ 1e6 rows per label.
Floor division of the SIGNED sx uses floor(a::DOUBLE / b) spelled
identically on both engines (Spark `div` truncates toward zero, DuckDB
`//` floors — they disagree on negatives).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def label_centroid_stats(
    df: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """(label, n_vecs, centroid_q2, ssd_q) with e4-quantized integer
    geometry: c_d = floor(Σ_i xq_di / n) per dimension; centroid_q2 =
    Σ_d c_d² (squared norm of the quantized centroid); ssd_q =
    Σ_d Σ_i (xq_di - c_d)² via the one-pass identity above."""
    q = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * 10000).cast("long").alias("xq"),
    )
    per_dim = q.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    c = F.floor(F.col("sx").cast("double") / F.col("n")).cast("long")
    per_dim = per_dim.select(
        "label",
        "n",
        (c * c).alias("cq2"),
        (
            F.col("sxx")
            - F.lit(2) * c * F.col("sx")
            + F.col("n") * c * c
        ).alias("dev"),
    )
    return per_dim.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.sum("cq2").cast("long").alias("centroid_q2"),
        F.sum("dev").cast("long").alias("ssd_q"),
    )


def duck_label_centroid_stats(vec_select: str, dims: int = 64) -> str:
    """DuckDB CTE body mirroring :func:`label_centroid_stats`; exposes
    ``cstats(label, n_vecs, centroid_q2, ssd_q)``. ``vec_select`` must
    project (label, embedding); ``dims`` is the fixed vector width."""
    return f"""__cs_rows AS (
  SELECT label, embedding, unnest(range(0, {dims})) AS dim
  FROM ({vec_select})
),
__cs_q AS (
  SELECT label, dim,
         CAST(floor(embedding[dim + 1]::DOUBLE * 10000) AS BIGINT) AS xq
  FROM __cs_rows
),
__cs_dim AS (
  SELECT label, dim, count(*)::BIGINT AS n,
         sum(xq)::BIGINT AS sx,
         sum(xq * xq)::BIGINT AS sxx
  FROM __cs_q GROUP BY label, dim
),
__cs_dev AS (
  SELECT label, n,
         CAST(floor(sx::DOUBLE / n) AS BIGINT) AS c,
         sxx AS sxx, sx AS sx
  FROM __cs_dim
),
cstats AS (
  SELECT label, max(n)::BIGINT AS n_vecs,
         sum(c * c)::BIGINT AS centroid_q2,
         sum(sxx - 2 * c * sx + n * c * c)::BIGINT AS ssd_q
  FROM __cs_dev GROUP BY label
)"""


def label_centroid_drift(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    half_col: str,
) -> DataFrame:
    """The drift monitor ts19's stats feed: per label, the squared L2
    distance between the quantized centroids of two slices
    (``half_col`` ∈ {'a','b'} — yesterday/today, shard-1/shard-2):
    (label, n_a, n_b, shift_q2 = Σ_d (c_a_d − c_b_d)²). A label whose
    centroid moved is re-labeled/drifting data; shift 0 means the two
    slices agree dimension-for-dimension after e4 quantization.

    Same one-explode plan as label_centroid_stats with (label, half,
    dim) keys; the pivot to per-dim (c_a, c_b) pairs is a conditional
    max inside the SAME aggregate — no join of the two halves."""
    q = df.select(
        F.col(label_col).alias("label"),
        F.col(half_col).alias("half"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        "label",
        "half",
        "dim",
        F.floor(F.col("x").cast("double") * 10000).cast("long").alias("xq"),
    )
    per = q.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xq").alias("sx")
    )
    c = F.floor(F.col("sx").cast("double") / F.col("n")).cast("long")
    piv = per.select("label", "half", "dim", F.col("n"), c.alias("c")).groupBy(
        "label", "dim"
    ).agg(
        F.max(F.when(F.col("half") == "a", F.col("c"))).alias("ca"),
        F.max(F.when(F.col("half") == "b", F.col("c"))).alias("cb"),
        F.max(F.when(F.col("half") == "a", F.col("n"))).alias("na"),
        F.max(F.when(F.col("half") == "b", F.col("n"))).alias("nb"),
    )
    d = F.coalesce("ca", F.lit(0)) - F.coalesce("cb", F.lit(0))
    return piv.groupBy("label").agg(
        F.max(F.coalesce("na", F.lit(0))).cast("long").alias("n_a"),
        F.max(F.coalesce("nb", F.lit(0))).cast("long").alias("n_b"),
        F.sum(d * d).cast("long").alias("shift_q2"),
    )


def duck_label_centroid_drift(vec_select: str, dims: int = 64) -> str:
    """DuckDB CTE body mirroring :func:`label_centroid_drift`; exposes
    ``cdrift(label, n_a, n_b, shift_q2)``. ``vec_select`` must project
    (label, half, embedding)."""
    return f"""__cd_rows AS (
  SELECT label, half, embedding, unnest(range(0, {dims})) AS dim
  FROM ({vec_select})
),
__cd_q AS (
  SELECT label, half, dim,
         CAST(floor(embedding[dim + 1]::DOUBLE * 10000) AS BIGINT) AS xq
  FROM __cd_rows
),
__cd_per AS (
  SELECT label, half, dim, count(*)::BIGINT AS n, sum(xq)::BIGINT AS sx
  FROM __cd_q GROUP BY label, half, dim
),
__cd_piv AS (
  SELECT label, dim,
         max(CASE WHEN half = 'a'
                  THEN CAST(floor(sx::DOUBLE / n) AS BIGINT) END) AS ca,
         max(CASE WHEN half = 'b'
                  THEN CAST(floor(sx::DOUBLE / n) AS BIGINT) END) AS cb,
         max(CASE WHEN half = 'a' THEN n END) AS na,
         max(CASE WHEN half = 'b' THEN n END) AS nb
  FROM __cd_per GROUP BY label, dim
),
cdrift AS (
  SELECT label,
         max(coalesce(na, 0))::BIGINT AS n_a,
         max(coalesce(nb, 0))::BIGINT AS n_b,
         sum((coalesce(ca, 0) - coalesce(cb, 0))
             * (coalesce(ca, 0) - coalesce(cb, 0)))::BIGINT AS shift_q2
  FROM __cd_piv GROUP BY label
)"""
