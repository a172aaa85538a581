"""HyperLogLog distinct-count registers (Flajolet, Fusy, Gandouet,
Meunier 2007) — m max-rank registers per group, mergeable map-side.

Where KMV keeps k hashes, HLL keeps m=64 single-byte registers: bucket =
h mod m, register = max over the bucket's hashes of the leading-zero rank
of the remaining 54 bits. ``groupBy(group, bucket).agg(max(rank))`` is the
entire build — partial max combines map-side, the shuffle carries at most
m rows per map partition per group, and two sketches merge by pointwise
max (the property that makes HLL the industry default for distinct counts
over partitioned scans).

Engine-exact estimator: the raw-HLL harmonic mean needs sum(2^-reg) —
a float sum whose reassociation would differ across engines. Instead the
sum is computed as the EXACT integer ``S = sum(2^(55-reg))`` (reg <= 55,
so every term is a nonnegative power of two and S < 2^61), and the final
estimate ``floor(alpha_m * m^2 * 2^55 / S)`` performs IEEE-exact doubles:
alpha_m * m^2 rounds once, * 2^55 (a power of two) is exact scaling, the
division rounds once — bit-identical in DuckDB. Small/large-range bias
corrections (linear counting / hash-collision) need ln(), so raw-HLL is
the contract here; callers needing the corrected curve compose it on the
returned registers.

Rank via bit-length, not log2: ``rank = 55 - bitlength(rest)`` where
bitlength is the length of the minimal binary string (Spark
``conv(rest, 10, 2)``, DuckDB ``ltrim(bin(rest), '0')``) — pure integer /
string ops, no transcendental boundary risk.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bioeco_portal_etl_spark.sketches import h60

M = 64  #: register count; stderr ~ 1.04/sqrt(m) ~ 13%
_REST_BITS = 54  #: 60-bit hash minus 6 bucket bits
#: alpha_64 = 0.7213 / (1 + 1.079/64) — the standard bias constant,
#: frozen as a literal so both engines parse the identical double.
ALPHA_M = 0.709351815
_POW55 = float(1 << 55)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: Column | str
) -> DataFrame:
    """(group_cols..., bucket, register) — the mergeable sketch state.
    Only buckets actually hit appear (absent bucket == register 0);
    :func:`hll_estimate` reinstates the zeros."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    h = h60(v.cast("string"))
    # h div 64 via shift — NOT h/64, which routes through double and loses
    # the low bits of a 60-bit hash (2^53 mantissa).
    rest = F.shiftright(h, 6)
    bitlen = F.length(F.conv(rest, 10, 2))
    rank = F.when(rest == 0, F.lit(_REST_BITS + 1)).otherwise(
        F.lit(_REST_BITS + 1) - bitlen
    )
    return (
        df.select(
            *group_cols,
            (h % M).alias("bucket"),
            rank.cast("long").alias("__rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rank").alias("register"))
    )


def merge_registers(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge finer-grained HLL sketches into coarser groups: register-wise
    MAX — the associative/commutative merge that makes HLL a reaggregable
    sketch (per-day sketches roll up to weeks/months/global without
    touching raw data; a lossless union, identical to sketching the
    coarser group directly). ``group_cols`` are the SURVIVING columns of
    :func:`hll_registers` output (finer columns simply drop out)."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], out_col: str = "est_distinct"
) -> DataFrame:
    """Raw-HLL estimate per group from :func:`hll_registers` output.

    Missing buckets contribute register 0, i.e. 2^55 each: S starts from
    ``m * 2^55`` and each present register subtracts its zero-term and adds
    ``2^(55-reg)`` — one grouped integer sum, no bucket fill-in join."""
    # shiftleft() takes a Python int count; per-row counts need the SQL form
    term = F.expr("shiftleft(1L, CAST(55 - register AS INT))")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term - F.lit(1 << 55)).alias("__delta")
    )
    s = F.col("__delta") + F.lit(M * (1 << 55))
    est = F.floor(F.lit(ALPHA_M * M * M) * F.lit(_POW55) / s).cast("long")
    return agg.select(*group_cols, est.alias(out_col))


def duck_hll(table: str, group_expr: str, value_expr: str) -> str:
    """DuckDB CTE body mirroring registers + estimate; exposes
    ``hll(grp, est_distinct)``."""
    from bioeco_portal_etl_spark.sketches import duck_h60

    h = duck_h60(f"CAST({value_expr} AS VARCHAR)")
    return f"""
hashed AS (
  SELECT {group_expr} AS grp, {h} AS h FROM {table}
),
ranks AS (
  SELECT grp, h % {M} AS bucket,
         CASE WHEN h // {M} = 0 THEN {_REST_BITS + 1}
              ELSE {_REST_BITS + 1} - length(ltrim(bin(h // {M}), '0'))
         END AS rank
  FROM hashed
),
regs AS (
  SELECT grp, bucket, max(rank) AS register FROM ranks GROUP BY grp, bucket
),
hll AS (
  SELECT grp,
         CAST(floor({ALPHA_M * M * M!r} * {_POW55!r}
              / (sum((1::BIGINT << (55 - register)) - {1 << 55})
                 + {M * (1 << 55)})) AS BIGINT) AS est_distinct
  FROM regs GROUP BY grp
)"""
