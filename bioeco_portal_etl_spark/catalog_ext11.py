"""Round-5 catalog extensions, eighth batch — 3 entries:

- gr10_random_walks: deterministic hash-driven random-walk corpus
  (graph/walks.py) — the DeepWalk/node2vec data-prep stage, md5-keyed so
  both engines reproduce the exact walk set;
- x30_scd2_asof: time-travel reconstruction over the x23 SCD2 history —
  "the dimension as of T", the query every slowly-changing-dimension
  build exists to answer;
- rel28_percent_rank: exact-rational percent_rank / cume_dist as pure
  integer division (no double division at all) — the distribution-
  position window family rounding out rel15's rank quantiles.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs over the
driver's synthetic tables, aliased identically on both sides, ending in
a deterministic ORDER BY; integer surfaces BIGINT-cast per
PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr10 — deterministic random-walk corpus
# ---------------------------------------------------------------------------

_GR10_EDGES_SQL = """SELECT a.o_custkey AS src, b.o_custkey AS dst
  FROM orders a JOIN orders b
    ON a.o_orderdate = b.o_orderdate AND a.o_custkey <> b.o_custkey"""
_GR10_LEN = 3


def gr10_random_walks(spark: SparkSession, sf: str) -> DataFrame:
    """One {l}-hop hash-driven walk from every 10th customer of the
    same-day co-activity graph (graph/walks.py): the walk corpus a graph
    embedding trains on, bit-reproducible because hop choices are md5
    functions of (walk, step, node) over sorted adjacency."""
    o = T(spark, sf, "orders").select("o_custkey", "o_orderdate")
    a, b = o.alias("a"), o.alias("b")
    edges = (
        a.join(b, "o_orderdate")
        .filter(F.col("a.o_custkey") != F.col("b.o_custkey"))
        .select(
            F.col("a.o_custkey").alias("src"),
            F.col("b.o_custkey").alias("dst"),
        )
    )
    from bioeco_portal_etl_spark.graph.walks import random_walks

    # Round-12 (guide §2.4): the co-activity join already emits both
    # orderings, so dedupe it ONCE — repartition("src") + dropDuplicates
    # is one exchange whose hash(src) layout the adjacency collect_set,
    # the seed distinct, AND every per-hop groupBy alignment then reuse
    # exchange-free — and persist it so adjacency and seeds don't each
    # replay the orders⋈orders join.
    sym = (
        edges.repartition("src").dropDuplicates(["src", "dst"]).persist()
    )
    seeds = (
        sym.select(F.col("src").alias("walk_id"))
        .distinct()
        .filter(F.col("walk_id") % 10 == 0)
    )
    return random_walks(
        sym, seeds, length=_GR10_LEN, pre_symmetrized=True
    ).orderBy("walk_id", "pos")


gr10_random_walks.__doc__ = gr10_random_walks.__doc__.format(l=_GR10_LEN)


def _gr10_sql() -> str:
    from bioeco_portal_etl_spark.graph.walks import duck_random_walks

    seeds = (
        "SELECT DISTINCT src AS walk_id FROM sym WHERE src % 10 = 0"
    )
    return f"""
WITH {duck_random_walks(_GR10_EDGES_SQL, seeds, length=_GR10_LEN)}
SELECT walk_id, pos, node FROM walks ORDER BY walk_id, pos"""


# ---------------------------------------------------------------------------
# x30 — SCD2 as-of (time travel)
# ---------------------------------------------------------------------------

_X30_T = "2024-02-15"


def x30_scd2_asof(spark: SparkSession, sf: str) -> DataFrame:
    """The user-state dimension AS OF {t}: filter the x23 SCD2 history to
    the version whose [valid_from, valid_to) interval covers T — the
    time-travel query the history build exists for. Exactly one row per
    key that existed by T."""
    from bioeco_portal_etl_spark.operators.scd import scd2_history

    e = T(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_history(
        e, ["user_id"], "event_type", ["ts", "event_id"], ts_col="ts"
    )
    t = F.lit(_X30_T).cast("timestamp")
    return (
        hist.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state_at_t"),
            F.col("version").cast("long").alias("version"),
        )
        .orderBy("user_id")
    )


x30_scd2_asof.__doc__ = x30_scd2_asof.__doc__.format(t=_X30_T)

X30_SQL = f"""
WITH c AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
chg AS (
  SELECT user_id, event_type, ts AS valid_from,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS version,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM c
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type AS state_at_t, version::BIGINT AS version
FROM chg
WHERE valid_from <= TIMESTAMP '{_X30_T} 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_X30_T} 00:00:00')
ORDER BY user_id"""


# ---------------------------------------------------------------------------
# rel28 — exact-rational percent_rank / cume_dist
# ---------------------------------------------------------------------------


def rel28_percent_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution position of each order's total price within its
    priority class, as EXACT integer rationals: pr_e6 = (1e6*(rank-1))
    div (n-1), cume_e6 = (1e6*rank) div n — no double division anywhere,
    so the surface is bit-portable without even a floor. Restricted to
    the o_custkey<100 slice for the gate."""
    from pyspark.sql import Window

    o = T(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wc = Window.partitionBy("o_orderpriority")
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.row_number().over(w).alias("__rk"),
            F.count(F.lit(1)).over(wc).alias("__n"),
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.expr(
                "CASE WHEN __n > 1 THEN (1000000 * (__rk - 1)) div (__n - 1)"
                " ELSE 0 END"
            ).cast("long").alias("pr_e6"),
            F.expr("(1000000 * __rk) div __n").cast("long").alias("cume_e6"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


REL28_SQL = """
WITH r AS (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_custkey < 100
)
SELECT o_orderpriority, o_orderkey,
       (CASE WHEN n > 1 THEN (1000000 * (rk - 1)) // (n - 1)
             ELSE 0 END)::BIGINT AS pr_e6,
       ((1000000 * rk) // n)::BIGINT AS cume_e6
FROM r ORDER BY o_orderpriority, o_orderkey"""


CATALOG_EXT11 = {
    "gr10_random_walks": (gr10_random_walks, _gr10_sql()),
    "x30_scd2_asof": (x30_scd2_asof, X30_SQL),
    "rel28_percent_rank": (rel28_percent_rank, REL28_SQL),
}
