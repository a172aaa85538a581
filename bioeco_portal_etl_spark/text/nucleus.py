"""Top-p (nucleus) vocabulary coverage per group: the smallest
count-descending prefix of a group's token distribution whose mass
reaches p — the statistic behind vocabulary truncation, nucleus-sampling
analyses, and "how head-heavy is this language/source" corpus triage
(a tiny nucleus means a few tokens carry the stratum).

Plan shape: token counts per (group, token) — one combinable agg — then
ONE window cumulative sum per group in (count DESC, token ASC) order and
a final per-group rollup. The window partitions by group, so it scales
with groups × vocab (Heaps-bounded), never corpus tokens.

Exactness: membership is decided on cross-multiplied integers
(1e6·cum_before < p_e6·total ⇔ the token starts strictly inside the
p-mass), so no division happens before the final e6 surfaces; the
(count DESC, token ASC) order is total, making the prefix deterministic
on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from bioeco_portal_etl_spark.text.tokenize import duck_tokens, tokens


def nucleus_coverage(
    docs: DataFrame,
    group_col: str,
    text_col: str,
    p_e6: int = 800_000,
) -> DataFrame:
    """(grp, n_vocab, total_tokens, n_nucleus, nucleus_mass_e6): tokens
    per group, the nucleus size at mass ``p_e6``/1e6, and the exact mass
    the nucleus actually covers (>= p by construction, in e6)."""
    tc = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(text_col)).alias("tok"),
        )
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("c"), F.asc("tok"))
    wg = Window.partitionBy("grp")
    flagged = tc.select(
        "grp",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wg).alias("total"),
    ).withColumn(
        "in_nucleus",
        (F.lit(1_000_000) * F.col("cum_before") < F.lit(p_e6) * F.col("total"))
        .cast("long"),
    )
    return flagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.max("total").cast("long").alias("total_tokens"),
        F.sum("in_nucleus").cast("long").alias("n_nucleus"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN in_nucleus = 1 THEN c ELSE 0 END))"
            " div max(total) AS BIGINT)"
        ).alias("nucleus_mass_e6"),
    )


def duck_nucleus_coverage(
    docs_select: str, group_col: str, p_e6: int = 800_000
) -> str:
    """DuckDB CTE body mirroring :func:`nucleus_coverage`; exposes
    ``nuc(grp, n_vocab, total_tokens, n_nucleus, nucleus_mass_e6)``.
    ``docs_select`` must project (grp via ``group_col``, text)."""
    arr = duck_tokens("text")
    return f"""__nc_tc AS (
  SELECT grp, tok, count(*)::BIGINT AS c FROM (
    SELECT {group_col} AS grp, unnest({arr}) AS tok
    FROM ({docs_select})
  ) GROUP BY grp, tok
),
__nc_w AS (
  SELECT grp, c,
         sum(c) OVER (PARTITION BY grp ORDER BY c DESC, tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - c AS cum_before,
         sum(c) OVER (PARTITION BY grp) AS total
  FROM __nc_tc
),
__nc_f AS (
  SELECT grp, c, total,
         CASE WHEN 1000000 * cum_before < {p_e6} * total
              THEN 1 ELSE 0 END AS in_nucleus
  FROM __nc_w
),
nuc AS (
  SELECT grp, count(*)::BIGINT AS n_vocab,
         max(total)::BIGINT AS total_tokens,
         sum(in_nucleus)::BIGINT AS n_nucleus,
         CAST((1000000 * sum(CASE WHEN in_nucleus = 1 THEN c ELSE 0 END))
              // max(total) AS BIGINT) AS nucleus_mass_e6
  FROM __nc_f GROUP BY grp
)"""
