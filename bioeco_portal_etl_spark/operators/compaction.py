"""Small-file compaction planning — the OPTIMIZE/compact scheduling step
of lakehouse table maintenance (Delta OPTIMIZE, Iceberg rewrite_data_
files): given a listing of data files per table partition, decide how
many target-sized output files a rewrite produces and how full they are.

Planning algorithm: NEXT-FIT DECREASING — sort files largest-first, walk
once, open a new output bin whenever the current one would overflow the
target size. Next-fit (vs first-fit) is the variant that is a PURE LEFT
FOLD over the sorted list: the accumulator is just (bins, current_load),
so the plan is expressible as identical fold algebra in Spark
(``F.aggregate``) and DuckDB (``list_reduce(list_prepend(...))``) —
engine-exact with zero procedural code, and within 2x of optimal on any
input (classic bin-packing bound; Johnson 1973).

Plan shape: file listings are metadata — thousands of rows per partition,
not billions — so ``collect_list`` per group is bounded by directory
width (the same justified-small-state argument as the fixture sink). One
groupBy exchange; the fold is codegen'd expression work.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def compaction_plan(
    files: DataFrame,
    group_col: str,
    file_col: str,
    size_col: str,
    target_size: int,
) -> DataFrame:
    """Per-group compaction summary: (group, n_files, total_size, n_bins,
    last_bin_load) under next-fit-decreasing with bin capacity
    ``target_size``. Files larger than the target get a bin of their own
    (the fold's overflow branch handles them naturally)."""
    # The fold accumulator is a SINGLE BIGINT encoding (nbins, load) as
    # nbins * 2^32 + load, not a struct: a struct accumulator triggers a
    # DuckDB list_reduce vectorization bug on the oracle side (the same
    # list folds to different results depending on OTHER rows in the
    # batch — reproduced on v1.x and pinned in tests/test_round5f_ops),
    # and the encoded form keeps both engines on the identical scalar
    # arithmetic anyway. Requires size > 0 per file (a zero-size file
    # would alias the empty accumulator) and sizes < 2^32 — both true of
    # any real file listing in MB.
    k_enc = 1 << 32
    sorted_sizes = F.expr(
        f"transform(array_sort(collect_list(struct(-{size_col} AS negsz,"
        f" {file_col} AS fid, {size_col} AS sz))), x -> x.sz)"
    )
    fold = F.expr(
        f"aggregate(__sizes, CAST(0 AS BIGINT), (acc, s) -> "
        f"CASE WHEN acc = 0 OR acc % {k_enc}L + s > {int(target_size)}L "
        f"THEN (acc div {k_enc}L + 1) * {k_enc}L + s "
        "ELSE acc + s END)"
    )
    return (
        files.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(size_col).alias("total_size"),
            sorted_sizes.alias("__sizes"),
        )
        .withColumn("__plan", fold)
        .select(
            group_col,
            "n_files",
            F.col("total_size").cast("long").alias("total_size"),
            F.expr(f"__plan div {k_enc}L").alias("n_bins"),
            F.expr(f"__plan % {k_enc}L").alias("last_bin_load"),
        )
    )


def duck_compaction_cte(
    files_select: str,
    group_col: str,
    file_col: str,
    size_col: str,
    target_size: int,
) -> str:
    """DuckDB mirror; ``files_select`` projects (group, file, size);
    exposes ``comp(group, n_files, total_size, n_bins, last_bin_load)``.
    The fold replays the identical encoded-BIGINT next-fit accumulator
    via list_reduce with a prepended zero-state (the repo's left-fold
    convention; see compaction_plan for why the accumulator is an
    encoded scalar rather than a struct)."""
    k_enc = 1 << 32
    return f"""
flist AS ({files_select}),
grouped AS (
  SELECT {group_col},
         count(*)::BIGINT AS n_files,
         sum({size_col})::BIGINT AS total_size,
         list_transform(
           list_sort(list(struct_pack(negsz := -{size_col},
                                      fid := {file_col},
                                      sz := {size_col}))),
           x -> x.sz) AS sizes
  FROM flist GROUP BY {group_col}
),
folded AS (
  SELECT {group_col}, n_files, total_size,
         list_reduce(
           list_prepend(0::BIGINT, sizes),
           (acc, s) -> CASE
             WHEN acc = 0 OR acc % {k_enc} + s > {int(target_size)}
             THEN (acc // {k_enc} + 1) * {k_enc} + s
             ELSE acc + s END) AS plan
  FROM grouped
),
comp AS (
  SELECT {group_col}, n_files, total_size,
         (plan // {k_enc})::BIGINT AS n_bins,
         (plan % {k_enc})::BIGINT AS last_bin_load
  FROM folded
)"""
