"""Hash-sampled quantiles: exact nearest-rank quantiles over a
deterministic uniform sample — the scale pattern for percentile
dashboards when a full per-group sort is too expensive and a mergeable
quantile sketch is overkill.

The sample predicate is ``h60(row id) % 2^bits == 0`` — md5-derived, so
the SAME rows are kept on every engine and every rerun (no RNG), the
estimate is reproducible, and the oracle can hash-match it exactly.
Error: nearest-rank quantiles of a Bernoulli(2^-bits) sample have
rank-error O(sqrt(q(1-q)/m)) for sample size m — at 100 TB a bits=10
sample (0.1%) still leaves millions of rows per group, tighter than any
fixed-size sketch of comparable memory.

Plan: the sample predicate evaluates in the scan stage (codegen md5 on
the id — pushdown-friendly, no shuffle), so only the sampled fraction
crosses the wire into the per-group rank sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from bioeco_portal_etl_spark.sketches import h60


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    qs: tuple[int, ...] = (50, 90, 99),
    bits: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Per-group nearest-rank quantile estimates from a 2^-bits hash
    sample: (group, n_sample, p<q>_e for each q).

    Rank k = ceil(q·n/100) spelled ``floor((q·n + 99) / 100)`` — the
    PORTABILITY floor-division form; value-at-rank selection (not
    interpolation) keeps the result engine-exact."""
    keep = h60(F.col(id_col).cast("string")) % (1 << bits) == 0
    v = F.floor(F.col(value_col) * scale).cast("long")
    sample = df.filter(keep).select(
        F.col(group_col).alias("g"), v.alias("__v")
    )
    # frequency-table rank selection (same plan rationale as
    # operators/stats.winsorize_stats): the window runs over the
    # per-(group, value) count table — distinct-value-bounded — never a
    # per-group sort of the sampled rows themselves
    freq = sample.groupBy("g", "__v").agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy("g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = freq.select(
        "g",
        "__v",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy("g")).alias("__n"),
    )
    aggs = [F.max("__n").alias("n_sample")]
    for q in qs:
        k = F.floor(
            (F.lit(q) * F.col("__n") + 99).cast("double") / 100
        ).cast("long")
        aggs.append(
            F.min(F.when(F.col("__cum") >= k, F.col("__v"))).alias(f"p{q}_e")
        )
    return cum.groupBy("g").agg(*aggs)
