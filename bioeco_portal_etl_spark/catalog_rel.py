"""Catalog extension: relational breadth beyond the reference's surface.

The reference uses only equi-left-joins, plain groupBy, and row_number
(SURVEY.md §2.5-2.8). A complete engine needs the neighboring operators a
user reaches for next; each is a thin declarative plan Catalyst already
executes well, cataloged with an oracle so the surface is verified, not
just present: rollup/cube reporting aggregates, lead/lag windows with
running sums, semi/anti joins (the has_shapefile / empty-layer patterns as
first-class joins), and conditional aggregation (pivot-style counts).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T


def p0_canonical_entities(spark: SparkSession, sf: str) -> DataFrame:
    """FLAGSHIP composite: the reference's canonical-table pipeline shape
    (SURVEY.md §3 EP1 step 6) in one oracle-checked query — union-by-name
    with null fill (U1) over two differently-shaped sources, slug identity
    (P12/P13), make-unique suffixing over NATURAL heavy collisions (A4:
    brand+type repeats across parts), and a deterministic id (P18)."""
    from bioeco_portal_etl_spark.functions.strings import make_identifier
    from bioeco_portal_etl_spark.operators.dedupe import make_unique
    from bioeco_portal_etl_spark.operators.union import union_by_name
    from pyspark.sql import Window

    parts = T(spark, sf, "part").select(
        F.col("p_partkey").alias("src_id"),
        F.concat_ws(" ", "p_brand", "p_type").alias("name"),
        F.lit("part").alias("entity"),
        F.round("p_retailprice", 2).alias("value"),
    )
    sups = T(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("src_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("entity"),
    )
    u = union_by_name(parts, sups)
    u = u.withColumn("identifier", make_identifier(F.col("name")))
    u = make_unique(u, "identifier", [F.col("entity"), F.col("src_id").asc()])
    w = Window.orderBy("entity", "src_id")
    return u.withColumn("id", F.row_number().over(w)).select(
        "id", "entity", "src_id", "identifier", "name", "value"
    ).orderBy("entity", "src_id")


P0_SQL = r"""
WITH u AS (
  SELECT p_partkey AS src_id, p_brand || ' ' || p_type AS name,
         'part' AS entity, round(p_retailprice, 2) AS value
  FROM part
  UNION ALL
  SELECT s_suppkey, s_name, 'supplier', NULL FROM supplier
),
slug AS (
  SELECT *,
         regexp_replace(
           regexp_replace(
             trim(regexp_replace(lower(name), '[()":'',&/.;]', '', 'g')),
             '[\s\-–]+', '_', 'g'),
           '[()":'',&/.;]', '', 'g') AS s
  FROM u
),
short AS (
  SELECT *, CASE WHEN length(s) > 58
                 THEN substr(s, 1, 29) || substr(s, length(s) - 28, 29)
                 ELSE s END AS base
  FROM slug
),
occs AS (
  SELECT *, row_number() OVER (PARTITION BY base ORDER BY entity, src_id) - 1 AS occ
  FROM short
)
SELECT row_number() OVER (ORDER BY entity, src_id) AS id,
       entity, src_id,
       CASE WHEN occ > 0 THEN base || '_' || occ ELSE base END AS identifier,
       name, value
FROM occs ORDER BY entity, src_id
"""


def rel1_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Rollup over (region, nation): per-nation, per-region subtotal, grand
    total — one pass, Expand-based, no self-union."""
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


REL1_SQL = """
SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def rel2_lead_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Per-customer order timeline: previous/next order dates and a running
    order count — lead/lag/frame windows over one (key, time) sort."""
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.lag("o_orderdate").over(w).cast("date").alias("prev_order"),
        F.lead("o_orderdate").over(w).cast("date").alias("next_order"),
        F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("order_seq"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


REL2_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate::date AS o_orderdate,
       lag(o_orderdate)  OVER w ::date AS prev_order,
       lead(o_orderdate) OVER w ::date AS next_order,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def rel3_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Semi + anti join in one result: customers WITH orders vs WITHOUT —
    the has_shapefile / empty-layer pattern as first-class joins."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").select("o_custkey")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit(True).alias("has_orders")
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit(False).alias("has_orders")
    )
    return with_orders.unionByName(without).orderBy("c_custkey")


REL3_SQL = """
SELECT c_custkey, TRUE AS has_orders FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT c_custkey, FALSE FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def rel4_conditional_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot-style conditional aggregation: per-nation order counts by
    status — sum(when(...)) columns, one aggregate, no pivot shuffle."""
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = T(spark, sf, "orders")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
        )
        .orderBy("c_nationkey")
    )


REL4_SQL = """
SELECT c_nationkey,
       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_finished,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_open,
       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_pending
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def rel5_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 parts by retail price per brand — rank + filter, the grouped
    top-k every curation pipeline needs (cf. similarity top-k)."""
    p = T(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", F.round("p_retailprice", 2).alias("price"))
        .orderBy("p_brand", "rk")
    )


REL5_SQL = """
SELECT p_brand, rk, p_partkey, round(p_retailprice, 2) AS price FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part)
WHERE rk <= 3 ORDER BY p_brand, rk
"""


def p3_blanks_to_null(spark: SparkSession, sf: str) -> DataFrame:
    """P3: mutate_all(~na_if(., '')) — blank strings to null across string
    columns (index.Rmd:64). Empty-string clerks are planted via substring."""
    from bioeco_portal_etl_spark.functions.strings import blanks_to_null

    c = T(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("")).otherwise(F.col("c_name")).alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return blanks_to_null(c).orderBy("c_custkey")


P3_SQL = """
SELECT c_custkey,
       nullif(CASE WHEN c_custkey % 7 = 0 THEN '' ELSE c_name END, '') AS name,
       c_mktsegment AS segment
FROM customer ORDER BY c_custkey
"""


def p4_flag_columns(spark: SparkSession, sf: str) -> DataFrame:
    """P4: regex-matched boolean conversion — non-null -> TRUE over matching
    columns (index.Rmd:99) and the =='x' EuroSea variant (:171)."""
    from bioeco_portal_etl_spark.operators.projection import flag_columns, flag_columns_eq

    p = T(spark, sf, "part").select(
        "p_partkey",
        F.when(F.col("p_size") > 25, F.col("p_type")).alias("eov_any"),
        F.when(F.col("p_size") % 3 == 0, F.lit("x"))
        .when(F.col("p_size") % 3 == 1, F.lit("y"))
        .alias("eov_x"),
    )
    flagged = flag_columns_eq(flag_columns(p, r"^eov_any$"), r"^eov_x$", "x")
    return flagged.orderBy("p_partkey")


P4_SQL = """
SELECT p_partkey,
       (CASE WHEN p_size > 25 THEN p_type END) IS NOT NULL AS eov_any,
       coalesce(trim(CASE WHEN p_size % 3 = 0 THEN 'x'
                          WHEN p_size % 3 = 1 THEN 'y' END) = 'x', FALSE) AS eov_x
FROM part ORDER BY p_partkey
"""


def rel6_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Custom temporal operator (operators/asof.py): for each error event,
    the latest click at-or-before it per user — one union + window pass,
    no point-in-time self-join. Oracle: DuckDB's native ASOF LEFT JOIN,
    proving the composition reproduces real as-of semantics. Right side
    deduped to one row per (user, ts) with a max-event_id tiebreak so both
    engines resolve ties identically."""
    from bioeco_portal_etl_spark.operators.asof import asof_join

    e = T(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("click_id"), "value")
    )
    out = asof_join(
        errors, clicks, "user_id", "ts", "ts", ["click_id", "value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_click_id").alias("click_id"),
        F.round("asof_value", 2).alias("click_value"),
    ).orderBy("event_id")


REL6_SQL = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts, event_id AS click_id, value FROM events
  WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT e.event_id, e.user_id, e.ts,
       c.ts AS click_ts, c.click_id, round(c.value, 2) AS click_value
FROM errors e
ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
"""


def rel7_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Custom temporal operator (operators/asof.py): clicks within ±5 min
    of each error per user, via 3-bucket candidate equi-join + exact
    filter — no per-key cross product. Oracle: DuckDB evaluates the raw
    inequality join, proving the binning loses no pairs."""
    from bioeco_portal_etl_spark.operators.asof import range_join_binned

    e = T(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    pairs = range_join_binned(errors, clicks, "user_id", "err_ts", "click_ts", 300.0)
    return (
        pairs.groupBy("err_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_nearby"),
            # decimal sum internally, double at the surface (gate convention)
            F.sum(F.col("click_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("err_id")
    )


REL7_SQL = """
SELECT e.event_id AS err_id, e.user_id, count(*) AS n_nearby,
       sum(CAST(c.value AS DECIMAL(18,6)))::DOUBLE AS sum_value
FROM events e
JOIN events c ON c.user_id = e.user_id AND c.event_type = 'click'
            AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


def rel9_cube(spark: SparkSession, sf: str) -> DataFrame:
    """Full grouping-sets lattice over (returnflag, linestatus): per-cell,
    both marginals, grand total in ONE Expand-based pass (4× input rows
    through the partial agg, one shuffle — vs 4 scans self-unioned).
    grouping_id distinguishes real nulls from subtotal rows."""
    l = T(spark, sf, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum internally, double at the surface (gate convention)
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


REL9_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       sum(CAST(l_quantity AS DECIMAL(18,6)))::DOUBLE AS sum_qty,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def rel8_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """Nested-JSON column extraction (SURVEY.md §1.2: the reference carries
    JSON payloads in string columns — GeoJSON FeatureCollections, API
    fixtures). Spark-first: ``from_json`` with an explicit schema (typed,
    codegen-friendly, one parse) rather than per-path string functions;
    the parsed struct feeds a plain aggregate. Oracle: DuckDB
    json_extract."""
    e = T(spark, sf, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k int").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p.k").cast("long")).alias("sum_k"),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
        )
        .orderBy("event_type")
    )


REL8_SQL = """
SELECT event_type, count(*) AS n,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS INTEGER) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS INTEGER) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""



def rel10_window_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-family window breadth: ntile quartiles, percent_rank and
    cume_dist per market segment over a deterministic (acctbal, custkey)
    order. All rank-based (exact rationals in double), exposed floor-e4 —
    engine-exact. One hash shuffle on the segment key."""
    c = T(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.floor(F.percent_rank().over(w) * 10000).cast("long").alias("pct_rank_e4"),
        F.floor(F.cume_dist().over(w) * 10000).cast("long").alias("cume_dist_e4"),
    ).orderBy("c_custkey")


REL10_SQL = """
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       floor(percent_rank() OVER w * 10000)::BIGINT AS pct_rank_e4,
       floor(cume_dist() OVER w * 10000)::BIGINT AS cume_dist_e4
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


def rel11_scd2_merge(spark: SparkSession, sf: str) -> DataFrame:
    """SCD type-2 dimension merge (operators/scd.py): supplier snapshot as
    the open dimension; an update batch where keys ≡0 (mod 4) change
    balance (+100), keys ≡1 resend identical values (no-op), and a sparse
    set of brand-new keys inserts. Changed keys close their old row at the
    effective date and open a new one; history and no-ops pass through."""
    from bioeco_portal_etl_spark.operators.scd import scd2_merge

    s = T(spark, sf, "supplier")
    dim = s.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    updates = (
        s.filter(F.col("s_suppkey") % 4 == 0)
        .select("s_suppkey", "s_name", (F.col("s_acctbal") + 100).alias("s_acctbal"))
        .unionByName(
            s.filter(F.col("s_suppkey") % 4 == 1).select(
                "s_suppkey", "s_name", "s_acctbal"
            )
        )
        .unionByName(
            s.filter(F.col("s_suppkey") % 97 == 0).select(
                (F.col("s_suppkey") + 100000).alias("s_suppkey"),
                F.concat(F.lit("NEW#"), F.col("s_suppkey").cast("string")).alias(
                    "s_name"
                ),
                F.lit(0.0).alias("s_acctbal"),
            )
        )
    )
    out = scd2_merge(
        dim, updates, "s_suppkey", ["s_name", "s_acctbal"], "1996-06-01"
    )
    return out.orderBy(
        "s_suppkey", "valid_from", F.col("valid_to").asc_nulls_last()
    )


REL11_SQL = """
WITH dim AS (
  SELECT s_suppkey, s_name, s_acctbal,
         DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM supplier),
upd AS (
  SELECT s_suppkey, s_name, s_acctbal + 100 AS s_acctbal
  FROM supplier WHERE s_suppkey % 4 = 0
  UNION ALL
  SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_suppkey % 4 = 1
  UNION ALL
  SELECT s_suppkey + 100000, 'NEW#' || s_suppkey, 0.0
  FROM supplier WHERE s_suppkey % 97 = 0),
changed AS (
  SELECT d.s_suppkey FROM dim d JOIN upd u USING (s_suppkey)
  WHERE NOT (d.s_name IS NOT DISTINCT FROM u.s_name
             AND d.s_acctbal IS NOT DISTINCT FROM u.s_acctbal))
SELECT * FROM (
  SELECT d.s_suppkey, d.s_name, d.s_acctbal, d.valid_from,
         CASE WHEN c.s_suppkey IS NOT NULL THEN DATE '1996-06-01' END AS valid_to
  FROM dim d LEFT JOIN changed c USING (s_suppkey)
  UNION ALL
  SELECT u.s_suppkey, u.s_name, u.s_acctbal, DATE '1996-06-01', NULL
  FROM upd u JOIN changed c USING (s_suppkey)
  UNION ALL
  SELECT u.s_suppkey, u.s_name, u.s_acctbal, DATE '1996-06-01', NULL
  FROM upd u LEFT JOIN dim d USING (s_suppkey) WHERE d.s_suppkey IS NULL)
ORDER BY s_suppkey, valid_from, valid_to ASC NULLS LAST
"""


def rel12_setops(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT (the set-op family the reference never uses —
    SURVEY.md §2.7 — completed here for relational coverage): customers
    active in 1995 vs 1996 classified as retained (INTERSECT), churned
    (EXCEPT), and new (reverse EXCEPT), unioned with a tag. Each set op
    is a hash-distinct shuffle on the key — Catalyst plans them as
    semi/anti joins over pre-deduped sides."""
    o = T(spark, sf, "orders")

    def active(year: int):
        return (
            o.filter(
                (F.col("o_orderdate") >= f"{year}-01-01")
                & (F.col("o_orderdate") < f"{year + 1}-01-01")
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = active(1995), active(1996)
    out = (
        y95.intersect(y96).select("o_custkey", F.lit("retained").alias("status"))
        .unionByName(
            y95.exceptAll(y96.select("o_custkey")).distinct()
            .select("o_custkey", F.lit("churned").alias("status"))
        )
        .unionByName(
            y96.exceptAll(y95.select("o_custkey")).distinct()
            .select("o_custkey", F.lit("new").alias("status"))
        )
    )
    return out.orderBy("o_custkey", "status")


REL12_SQL = """
WITH y95 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
),
y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT o_custkey, 'retained' AS status FROM (
  SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT o_custkey, 'churned' FROM (
  SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
UNION ALL
SELECT o_custkey, 'new' FROM (
  SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
ORDER BY o_custkey, status
"""


def rel13_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-frame window (the physical-offset frame rel10's rank family
    doesn't cover): per event, the count and decimal-exact sum of the
    same user's values in the trailing hour — event-time sliding
    aggregates at row grain, no self-join. One hash(user) exchange;
    the frame is evaluated over the sorted run. Epoch-µs ordering keys
    make Spark's rangeBetween and DuckDB's RANGE INTERVAL identical."""
    e = T(spark, sf, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            ts_us.alias("t_us"),
            F.col("value"),
            F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("sum_trailing_1h"),
        )
        .drop("value")
        .orderBy("event_id")
    )


REL13_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS t_us,
       count(*) OVER w AS n_trailing_1h,
       (sum(CAST(value AS DECIMAL(18,6))) OVER w)::DOUBLE AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def rel14_hierarchy_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive-CTE workload (operators/hierarchy.py flatten_hierarchy):
    transitive closure of a parent-pointer forest to (node, root, depth)
    via pointer jumping — Spark SQL has no WITH RECURSIVE, the driver loop
    converges in O(log depth) self-joins. Fixture: a deterministic forest
    over customers (parent = custkey div 7, custkeys 1-6 are roots), depth
    ~ log7(n) so it scales with SF. Oracle: DuckDB recursive CTE over the
    identical relation."""
    from bioeco_portal_etl_spark.operators.hierarchy import flatten_hierarchy

    c = T(spark, sf, "customer")
    nodes = c.select(
        F.col("c_custkey").alias("node"),
        F.when(
            F.expr("c_custkey div 7") >= 1, F.expr("c_custkey div 7")
        ).alias("parent"),
    )
    return flatten_hierarchy(nodes).orderBy("node")


REL14_SQL = """
WITH RECURSIVE h(node, root, depth) AS (
  SELECT c_custkey, c_custkey, 0::BIGINT FROM customer WHERE c_custkey // 7 < 1
  UNION ALL
  -- the parent relation is DEFINED as div7 only where div7 >= 1 (custkeys
  -- 0-6 are roots); without that guard custkey 0 is its own div7-child and
  -- the recursion never terminates
  SELECT c.c_custkey, h.root, h.depth + 1
  FROM customer c JOIN h ON c.c_custkey // 7 = h.node
  WHERE c.c_custkey // 7 >= 1
)
SELECT node, root, depth FROM h ORDER BY node
"""


def rel15_rank_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact rank-based quantiles per group (lower median and p90 of order
    totalprice by priority) — the deterministic alternative to interpolated
    percentile for cross-engine exactness: the quantile IS an element of
    the group (the rank-ceil(q*n) row under a total order with an explicit
    tiebreak), so no float interpolation ever happens and both engines
    return byte-identical doubles. One hash(priority) window exchange;
    the rank filter + conditional agg avoid any second shuffle."""
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") / 2), F.col("o_totalprice")
                )
            ).alias("median_price"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 0.9), F.col("o_totalprice")
                )
            ).alias("p90_price"),
        )
        .orderBy("o_orderpriority")
    )


REL15_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, max(n) AS n_orders,
       max(CASE WHEN rn = ceil(n / 2) THEN o_totalprice END) AS median_price,
       max(CASE WHEN rn = ceil(n * 0.9) THEN o_totalprice END) AS p90_price
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


CATALOG_REL: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "rel10_window_suite": (rel10_window_suite, REL10_SQL),
    "rel11_scd2_merge": (rel11_scd2_merge, REL11_SQL),
    "p0_canonical_entities": (p0_canonical_entities, P0_SQL),
    "p3_blanks_to_null": (p3_blanks_to_null, P3_SQL),
    "p4_flag_columns": (p4_flag_columns, P4_SQL),
    "rel1_rollup": (rel1_rollup, REL1_SQL),
    "rel2_lead_lag": (rel2_lead_lag, REL2_SQL),
    "rel3_semi_anti": (rel3_semi_anti, REL3_SQL),
    "rel4_conditional_pivot": (rel4_conditional_pivot, REL4_SQL),
    "rel5_topk_per_group": (rel5_topk_per_group, REL5_SQL),
    "rel6_asof_join": (rel6_asof_join, REL6_SQL),
    "rel7_range_join": (rel7_range_join, REL7_SQL),
    "rel8_json_props": (rel8_json_props, REL8_SQL),
    "rel9_cube": (rel9_cube, REL9_SQL),
    "rel12_setops": (rel12_setops, REL12_SQL),
    "rel13_range_frame": (rel13_range_frame, REL13_SQL),
    "rel14_hierarchy_flatten": (rel14_hierarchy_flatten, REL14_SQL),
    "rel15_rank_quantiles": (rel15_rank_quantiles, REL15_SQL),
}
