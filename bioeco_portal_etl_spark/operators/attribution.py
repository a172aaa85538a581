"""Multi-touch marketing attribution over an event stream: for every
conversion event, resolve the FIRST-touch and LAST-touch channel from the
user's preceding history, then roll conversions + revenue up per channel.

Plan: ONE window pass over the stream — ``first/last(..., ignorenulls)``
over ``(user) ORDER BY (ts, id) ROWS UNBOUNDED PRECEDING .. 1 PRECEDING``
resolves both touches in the same sort, so the events table is shuffled
ONCE on ``user`` (the same hash partitioning every other per-user op in
this repo reuses) instead of the naive per-conversion point-lookup join
(a conversions × history range join that explodes quadratically on heavy
users at clickstream scale). The rollup after the window is a tiny
per-channel aggregate.

Determinism: touch ties are impossible — the window orders by
``(ts, id)`` with a unique id; revenue sums run as DECIMAL (exact,
reassociation-free) and surface as DOUBLE per the PORTABILITY contract.

Extends the reference's event-table lineage (occurrence → programme
rollups, `notebooks/index.Rmd:430-470`) with the channel-attribution
rollup a training-corpus/product pipeline needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def attribute_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-channel (ft/lt conversions, ft/lt revenue) for ``conversion_type``
    events, attributed to the user's first / most recent OTHER event type.

    ``id_col`` is the unique-id tie-break for same-timestamp events (same
    parameterization as markov_transitions / cusum_drift).

    Output: (channel, ft_conversions, ft_revenue, lt_conversions,
    lt_revenue) — channels with zero touches on one model surface 0/0.0.
    Conversions with NO preceding touch (organic) are dropped, matching
    the usual attribution-report semantics."""
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        df.select(
            F.col(user_col),
            F.col(type_col),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
            F.first(touch, ignorenulls=True).over(w).alias("__ft"),
            F.last(touch, ignorenulls=True).over(w).alias("__lt"),
        )
        .filter(F.col(type_col) == conversion_type)
        .filter(F.col("__ft").isNotNull())
    )
    ft = conv.groupBy(F.col("__ft").alias("channel")).agg(
        F.count(F.lit(1)).alias("ft_conversions"),
        F.sum("__v").cast("double").alias("ft_revenue"),
    )
    lt = conv.groupBy(F.col("__lt").alias("channel")).agg(
        F.count(F.lit(1)).alias("lt_conversions"),
        F.sum("__v").cast("double").alias("lt_revenue"),
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("ft_conversions", F.lit(0)).alias("ft_conversions"),
            F.coalesce("ft_revenue", F.lit(0.0)).alias("ft_revenue"),
            F.coalesce("lt_conversions", F.lit(0)).alias("lt_conversions"),
            F.coalesce("lt_revenue", F.lit(0.0)).alias("lt_revenue"),
        )
    )
