"""Z-order (Morton-curve) multi-dimensional clustering — the lakehouse
layout optimization for multi-column pruning.

A table range-partitioned on ONE column prunes scans filtered on that
column only; filters on a second column still read every file. Z-ordering
interleaves the bits of several quantized columns into a single sort key,
so sorting by it keeps files simultaneously tight in EVERY interleaved
dimension — a file's (min, max) footprint becomes a small hyper-rectangle
and the reader's row-group min/max statistics prune on any of the dims.
This is the same public technique Delta Lake's OPTIMIZE ZORDER BY and
ClickHouse/DuckDB space-filling-curve layouts use (Morton 1966; public
algorithm).

Engine mapping:
- :func:`z_expr` builds the interleave as a pure JVM bit expression
  (unrolled shift/mask/OR — no UDF, stays inside whole-stage codegen);
- :func:`zorder_layout` is the write path:
  ``repartitionByRange(_z)`` (one range shuffle — the amortized cost,
  same as any re-clustering) + ``sortWithinPartitions(_z)`` so parquet
  row groups inherit the locality;
- the quantizers are plain ``floor(col / step)`` — range-preserving, so
  z-proximity implies proximity in each original dim.

At 100 TB: the range shuffle is the one-time cost; every later scan with
a predicate on ANY z-dim prunes files/row-groups via parquet statistics
instead of reading the full table. Choose bits-per-dim so the grid cell
count ≈ a few × file count (finer wastes key bits, coarser wastes
pruning).

Reference parity: the reference ETL materializes per-identifier shapefile
layers (its own physical layout step, SURVEY.md §2 K1); z-ordering is the
engine's scale-path generalization for columnar lakehouse storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def z_expr_sql(a: str, b: str, bits: int = 8, dialect: str = "spark") -> str:
    """The Morton interleave of two already-quantized non-negative ints as
    a SQL string, unrolled to ``2*bits`` disjoint single-bit terms.

    ``a``'s bit i lands at output bit ``2i+1``, ``b``'s at ``2i`` — the
    conventional even/odd split. Terms are OR-combined; they are disjoint,
    so evaluation order is irrelevant and both engines fold constants the
    same way. ``dialect`` picks shift spellings: Spark's ``shiftleft()``/
    ``shiftright()`` functions vs DuckDB's ``<<``/``>>`` operators —
    semantics identical on non-negative BIGINTs below 2^62. The DuckDB
    operand is CAST to BIGINT first: DuckDB's ``<<`` keeps the operand's
    width, so an INTEGER-typed input (e.g. a literal) overflows at shift
    31 where a BIGINT column would not — the cast makes the expression
    input-type-independent (no-op for BIGINT inputs)."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
            terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
        else:
            wa = f"CAST({a} AS BIGINT)"
            wb = f"CAST({b} AS BIGINT)"
            terms.append(f"((({wa} >> {i}) & 1) << {2 * i + 1})")
            terms.append(f"((({wb} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def z_expr(a: str, b: str, bits: int = 8) -> Column:
    """:func:`z_expr_sql` as a Spark Column (JVM-side, codegen-friendly)."""
    return F.expr(z_expr_sql(a, b, bits, dialect="spark"))


def quantize(col: str, step: int, max_code: int) -> Column:
    """Range-preserving quantizer: ``least(col // step, max_code)``.

    Floor-division keeps ordering (z-proximity => dim proximity); the cap
    keeps outliers from stealing high bits. Both engines floor-divide
    non-negative BIGINTs identically."""
    return F.least(
        F.expr(f"CAST(floor({col} / {step}) AS BIGINT)"),
        F.lit(max_code).cast("long"),
    )


def zorder_layout(
    df: DataFrame,
    a_code: Column,
    b_code: Column,
    bits: int = 8,
    num_files: int = 32,
) -> DataFrame:
    """Attach the z key and return the frame clustered for writing:
    ``repartitionByRange`` on ``_z`` (range shuffle ≈ one OPTIMIZE pass)
    then sorted within partitions so row-group stats are tight. Callers
    ``.write.parquet(...)`` the result; ``_z`` may be dropped or kept as
    an explicit cluster column."""
    with_z = df.withColumn("_za", a_code).withColumn("_zb", b_code).withColumn(
        "_z", z_expr("_za", "_zb", bits)
    )
    return (
        with_z.drop("_za", "_zb")
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
    )


def z_bucket_profile(
    df: DataFrame,
    a_code: Column,
    b_code: Column,
    bits: int = 8,
    bucket_shift: int = 8,
) -> DataFrame:
    """Locality audit of the z layout: group rows by the TOP z bits (one
    bucket ≈ one file of the clustered layout) and report each bucket's
    footprint in both source dims.

    Output per bucket: row count and (min, max) of each quantized dim —
    the exact numbers a parquet reader's min/max pruning would see. Tight
    spans in BOTH columns are the proof the interleave worked; a 1-D sort
    would show span ≈ full range in the second dim."""
    coded = df.withColumn("_za", a_code).withColumn("_zb", b_code).withColumn(
        "_z", z_expr("_za", "_zb", bits)
    )
    return (
        coded.withColumn(
            "zbucket", F.expr(f"shiftright(_z, {bucket_shift})")
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_za").alias("a_min"),
            F.max("_za").alias("a_max"),
            F.min("_zb").alias("b_min"),
            F.max("_zb").alias("b_max"),
        )
        .withColumn("a_span", F.col("a_max") - F.col("a_min"))
        .withColumn("b_span", F.col("b_max") - F.col("b_min"))
    )
