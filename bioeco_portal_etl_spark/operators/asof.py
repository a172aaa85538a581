"""As-of and range joins — temporal operators Spark lacks as built-ins.

The reference has no temporal joins (SURVEY.md §2.5: equi-left-joins only),
but any event/time-series workload on this engine's `events` table needs
them. Both are implemented as COMPOSITIONS of shuffle-efficient built-ins
(no mapInPandas, no cross join), the (a)-tier strategy from the engine's
custom-operator policy:

- ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` (optionally within a tolerance) per key. The
  classic distributed formulation: tag both sides, union, and run ONE
  window pass per key ordered by time — ``last(col, ignorenulls=True)``
  carries the most recent right payload forward onto each left row. Cost
  at 100 TB: a single hash shuffle of (left + right) on the join key plus
  a per-partition sort — same shape as a sort-merge join, with no
  point-in-time self-join blowup.

- ``range_join_binned``: pairs (left, right) with
  ``|right_ts - left_ts| <= radius`` per key. A naive theta-join is a
  per-key cross product; binning quantizes time into ``radius``-wide
  buckets so each left row equi-joins only its own and adjacent buckets
  (3 candidate buckets), then the exact predicate filters. Shuffle is on
  (key, bucket) — bounded fan-out, no cross join, skew-safe for uniform
  time data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _us(ts: Column) -> Column:
    """Epoch µs, NTZ-tolerant: unix_micros requires TIMESTAMP (LTZ) but
    parquet event tables commonly surface TIMESTAMP_NTZ. The session tz is
    UTC, so casting NTZ→LTZ maps wall-clock to the same instant (and is a
    no-op on already-LTZ input)."""
    return F.unix_micros(ts.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, enriched with the payload of the
    latest right row at-or-before its timestamp (per ``on`` key).

    Right rows must be unique per (key, ts) — dedupe upstream if not; the
    union-window formulation would otherwise pick the row latest in the
    sort, which is only deterministic given an explicit tiebreak.
    Unmatched (no earlier right row, or outside ``tolerance_s``) leaves
    the payload columns null, like a left join.

    The whole right payload travels as ONE struct through a single
    ``last(ignorenulls)`` — carrying columns independently would let a
    NULL in the matched row's payload fall back to an OLDER right row for
    that column only, silently mixing columns from different right rows."""
    for c in right_cols:
        if c in left.columns:
            raise ValueError(f"right col {c!r} collides with a left column")
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    # right rows sort BEFORE a left row at the same instant -> "at or before"
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType)).unionByName(
        l
    )
    filled = carried.select(
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__side") == 1)
    if tolerance_s is not None:
        in_tol = F.col("__m").isNotNull() & (
            _us(F.col("__l")[left_ts]) - _us(F.col("__m.__rts"))
            <= int(tolerance_s * 1_000_000)
        )
        filled = filled.select(
            "__side", "__l", F.when(in_tol, F.col("__m")).alias("__m")
        )
    return filled.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        F.col("__m.__rts").alias(f"{prefix}ts"),
        *[F.col("__m")[c].alias(f"{prefix}{c}") for c in right_cols],
    )


def _bucket(ts: Column, radius_s: float) -> Column:
    return F.floor(_us(ts) / int(radius_s * 1_000_000))


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    radius_s: float,
) -> DataFrame:
    """Inner join of rows within ``radius_s`` seconds per key, via 3-bucket
    candidate generation + exact filter. Column collisions are avoided by
    the caller projecting distinct names (as with any Spark join)."""
    if radius_s <= 0:
        raise ValueError(f"radius_s must be > 0, got {radius_s}")
    lb = left.withColumn("__lb", _bucket(F.col(left_ts), radius_s))
    rb = right.withColumn(
        "__rb", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).withColumn("__rb", F.col("__rb") + _bucket(F.col(right_ts), radius_s))
    j = lb.join(rb, (lb[on] == rb[on]) & (lb.__lb == rb.__rb)).drop(rb[on])
    exact = (
        F.abs(_us(F.col(left_ts)) - _us(F.col(right_ts)))
        <= int(radius_s * 1_000_000)
    )
    return j.filter(exact).drop("__lb", "__rb")
