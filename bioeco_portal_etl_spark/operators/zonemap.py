"""Zone-map (min/max statistics) pruning audit — "how many files would
this predicate actually skip under this layout?"

Parquet/ORC readers prune files and row groups from per-column (min,
max) statistics; how much they prune is ENTIRELY a property of the
physical layout. `operators/zorder.py` builds better layouts — this
module measures them: it models a layout as a file-assignment
expression, computes each file's zone map, and evaluates a predicate
set against those zone maps, reporting files skipped and rows that
still scan. Running it for two candidate layouts side by side is the
quantitative case for (or against) an OPTIMIZE rewrite before anyone
burns a 100 TB re-cluster.

File model: files are VALUE-RANGE buckets (``file = key_expr``, e.g.
``order_day // 30`` for date-partitioned monthly files or ``z >> 8``
for a z-clustered layout) — the shape range-partitioned writers
produce. Deliberately NOT ``row_number() // rows_per_file``: a global
row_number is a single-task sort (the anti-pattern the winsorize
rewrite removed) and models nothing a distributed writer would emit.

Interval logic: a file is skippable for ``col BETWEEN lo AND hi`` iff
``max(col) < lo OR min(col) > hi``; a conjunction skips if ANY conjunct
proves disjointness. All integer comparisons — exact on any engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zone_maps(
    df: DataFrame, file_expr: Column, stat_cols: list[str]
) -> DataFrame:
    """Per-file zone maps: one row per file with n_rows and (min, max)
    of every stat column. One partial-combinable aggregate — at 100 TB
    this is the same pass a writer's footer-stats collection does."""
    agg = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        agg += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(file_expr.alias("file_id")).agg(*agg)


def skip_report(
    zmaps: DataFrame,
    layout: str,
    predicates: list[tuple[str, list[tuple[str, int, int]]]],
) -> DataFrame:
    """Evaluate predicates against zone maps: one output row per
    predicate — (layout, predicate, files_total, files_skipped,
    rows_scanned). ``predicates`` is [(name, [(col, lo, hi), ...])] —
    each entry a conjunction of closed-interval range filters.

    The evaluation is a projection + one aggregate over the (tiny)
    zone-map table; the base table is never rescanned."""
    per_pred = []
    for name, conjuncts in predicates:
        skip = F.lit(False)
        for col, lo, hi in conjuncts:
            skip = skip | (F.col(f"{col}_max") < lo) | (F.col(f"{col}_min") > hi)
        per_pred.append(
            zmaps.select(
                F.lit(layout).alias("layout"),
                F.lit(name).alias("predicate"),
                F.lit(1).cast("long").alias("f_total"),
                skip.cast("long").alias("f_skip"),
                F.when(skip, F.lit(0)).otherwise(F.col("n_rows")).alias("r_scan"),
            )
        )
    u = per_pred[0]
    for p in per_pred[1:]:
        u = u.unionByName(p)
    return u.groupBy("layout", "predicate").agg(
        F.sum("f_total").alias("files_total"),
        F.sum("f_skip").alias("files_skipped"),
        F.sum("r_scan").alias("rows_scanned"),
    )


def duck_zone_skip(
    source_sql: str,
    layouts: list[tuple[str, str]],
    stat_cols: list[str],
    predicates: list[tuple[str, list[tuple[str, int, int]]]],
) -> str:
    """DuckDB CTE body mirroring zone_maps + skip_report for several
    layouts at once; exposes ``zskip(layout, predicate, files_total,
    files_skipped, rows_scanned)``. ``layouts`` is [(name, file_expr_sql)]
    over the columns of ``source_sql``."""
    stats = ", ".join(
        f"min({c}) AS {c}_min, max({c}) AS {c}_max" for c in stat_cols
    )
    zm = " UNION ALL ".join(
        f"SELECT '{lname}' AS layout, {fexpr} AS file_id,"
        f" count(*) AS n_rows, {stats} FROM __zm_src GROUP BY file_id"
        for lname, fexpr in layouts
    )
    evals = []
    for pname, conjuncts in predicates:
        skip = " OR ".join(
            f"({c}_max < {lo} OR {c}_min > {hi})" for c, lo, hi in conjuncts
        )
        evals.append(
            f"SELECT layout, '{pname}' AS predicate,"
            f" count(*)::BIGINT AS files_total,"
            f" sum(CASE WHEN {skip} THEN 1 ELSE 0 END)::BIGINT AS files_skipped,"
            f" sum(CASE WHEN {skip} THEN 0 ELSE n_rows END)::BIGINT AS rows_scanned"
            f" FROM __zm_maps GROUP BY layout"
        )
    return (
        f"__zm_src AS ({source_sql}),\n"
        f"__zm_maps AS ({zm}),\n"
        f"zskip AS ({' UNION ALL '.join(evals)})"
    )
