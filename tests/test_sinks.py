"""Sink tests (SURVEY.md §2.2): fixture JSON, keyed upsert, delete+insert
set replacement, SQL-script generation. DB sinks run against sqlite via the
injectable DB-API factory (no Postgres in this environment — the SQL shapes
are dialect-parameterized)."""

from __future__ import annotations

import json
import sqlite3

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.sinks.fixtures import write_fixture
from bioeco_portal_etl_spark.sinks.jdbc_upsert import (
    replace_set_partitioned,
    upsert_partitioned,
)
from bioeco_portal_etl_spark.sinks.sqlscript import sql_update_script
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE


def test_fixture_json_roundtrip(spark, tmp_path):
    """K4: Django-loaddata array framing (index.Rmd:648-656)."""
    n = read_parquet_table(spark, SF_SMOKE, "nation").limit(5)
    out = tmp_path / "nations.json"
    write_fixture(
        n, "app.nation", "n_nationkey", ["n_name", "n_regionkey"], str(out),
        order_by="n_nationkey",
    )
    data = json.loads(out.read_text())
    assert len(data) == 5
    assert data[0]["model"] == "app.nation"
    assert set(data[0]["fields"]) == {"n_name", "n_regionkey"}
    assert [d["pk"] for d in data] == sorted(d["pk"] for d in data)


def _sqlite_factory(path):
    def connect():
        return sqlite3.connect(path, timeout=60)

    return connect


def test_upsert_partitioned_sqlite(spark, tmp_path):
    """K5: keyed upsert is idempotent and updates in place."""
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, name TEXT, bal REAL)")
        c.execute("INSERT INTO t VALUES (1, 'stale', -1.0)")
    df = (
        read_parquet_table(spark, SF_SMOKE, "customer")
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
        )
        .filter(F.col("k") <= 10)
        .coalesce(1)
    )
    for _ in range(2):  # twice: idempotence under task retry
        upsert_partitioned(
            df, _sqlite_factory(db), "t", ["k"], ["name", "bal"], dialect="sqlite"
        )
    with sqlite3.connect(db) as c:
        rows = dict(c.execute("SELECT k, name FROM t").fetchall())
    assert len(rows) == 11  # custkeys 0..10
    assert rows[1] != "stale"


def test_replace_set_partitioned_sqlite(spark, tmp_path):
    """K6: per-group delete+insert replaces stale association rows."""
    db = str(tmp_path / "assoc.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE links (gid INTEGER, val TEXT)")
        c.execute("INSERT INTO links VALUES (0, 'stale'), (0, 'stale2'), (99, 'keep')")
    df = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "gid int, val string"
    )
    replace_set_partitioned(df, _sqlite_factory(db), "links", "gid", ["val"])
    with sqlite3.connect(db) as c:
        rows = sorted(c.execute("SELECT gid, val FROM links").fetchall())
    assert rows == [(0, "a"), (0, "b"), (1, "c"), (99, "keep")]


def test_csv_write_roundtrip(spark, tmp_path):
    """K3: CSV write (eov_to_keywords.Rmd:47 backup export) — single-file
    coalesce, header, read-back parity."""
    out = str(tmp_path / "links_csv")
    df = spark.createDataFrame(
        [(11, 1), (11, 2), (12, 1)], "layer_id int, eov_id int"
    )
    df.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert sorted((r.layer_id, r.eov_id) for r in back.collect()) == [
        (11, 1), (11, 2), (12, 1),
    ]


def test_sql_update_script(spark):
    """K8: null sentinel renders unquoted; values render quoted."""
    df = spark.createDataFrame([("x", "A"), (None, "B")], "v string, k string")
    stmts = sorted(r.stmt for r in sql_update_script(df, "tbl", "c", "v", "k").collect())
    assert stmts == [
        "update tbl set c = 'x' where k = 'A';",
        "update tbl set c = null where k = 'B';",
    ]
