"""Operator-level tests for the round-5 ninth batch: Gopher rule flags,
approximate-FD audit, DSIR importance weights, hard-negative mining, and
the seq-guarded CDC MERGE sink (unit SQL + live Derby apply)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_gopher_flags_rules(spark):
    from bioeco_portal_etl_spark.text.gopher import gopher_flags

    rows = [
        # 60 words incl 'the' -> passes every rule
        (1, ("the quick brown foxes jump over lazy dogs near banks " * 6).strip()),
        # 3 words -> fails word-count rule only... also stopword 'the' absent
        (2, "tiny doc here"),
        # symbol-heavy: '#' per word > 0.1
        (3, ("the word " * 30).strip() + " " + "# # # # # # # #"),
        (4, None),  # null text -> all-zero signals, fails
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_flags(d, "doc_id", "text").collect()
    }
    assert got[1]["n_words"] == 60
    assert got[1]["pass_all"] == 1
    assert got[2]["r_words"] == 0 and got[2]["r_stop"] == 0
    assert got[2]["pass_all"] == 0
    # doc 3: 68 words, 8 '#' -> 8/68 > 0.1 -> symbol rule fails
    assert got[3]["r_symbol"] == 0 and got[3]["r_words"] == 1
    assert got[4]["n_words"] == 0 and got[4]["pass_all"] == 0
    # flags are BIGINT 0/1, not booleans (portability contract)
    q = gopher_flags(d, "doc_id", "text")
    assert all(
        f.dataType.simpleString() == "bigint"
        for f in q.schema.fields
        if f.name != "doc_id"
    )


def test_fd_audit_counts(spark):
    from bioeco_portal_etl_spark.operators.quality import fd_audit

    rows = [
        (1, "a", "x"), (1, "a", "x"), (1, "b", "x"),  # key 1: 2 rhs values
        (2, "c", "y"), (2, "c", "y"),                 # key 2: clean
        (3, "d", "z"),
    ]
    d = spark.createDataFrame(rows, "k long, v string, w string")
    got = {
        (r["lhs_col"], r["rhs_col"]): r.asDict()
        for r in fd_audit(d, [("k", "v"), ("k", "w")]).collect()
    }
    kv = got[("k", "v")]
    assert kv["n_keys"] == 3 and kv["n_violating_keys"] == 1
    # majority repair keeps 2 (of key 1's 3) + 2 + 1 = 5 of 6 rows
    assert kv["kept_rows"] == 5 and kv["n_rows"] == 6
    assert kv["support_e6"] == (1_000_000 * 5) // 6
    kw = got[("k", "w")]  # k -> w holds exactly
    assert kw["n_violating_keys"] == 0 and kw["support_e6"] == 1_000_000


def test_dsir_weights_prefer_target_like_docs(spark):
    from bioeco_portal_etl_spark.text.dsir import dsir_weights

    # target docs speak "alpha beta"; raw-only docs speak "gamma delta".
    rows = [
        (1, "alpha beta alpha beta", 1),
        (2, "alpha beta beta alpha", 1),
        (3, "gamma delta gamma delta", 0),
        (4, "alpha beta alpha beta", 0),  # raw doc in target language
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, t int")
    out = {
        r["doc_id"]: r.asDict()
        for r in dsir_weights(d, "doc_id", "text", F.col("t") == 1).collect()
    }
    assert all(out[i]["n_tokens"] == 4 for i in (1, 2, 3, 4))
    # target-language docs score identically and strictly above the
    # out-of-domain doc
    assert out[1]["w_e6"] == out[2]["w_e6"] == out[4]["w_e6"]
    assert out[4]["w_e6"] > out[3]["w_e6"]


def test_hard_negative_topk_excludes_same_label(spark):
    from bioeco_portal_etl_spark.similarity.knn import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label as query 0 — must never appear
        (2, [0.9, 0.3], 1),
        (3, [0.5, 0.8], 1),
        (4, [-1.0, 0.0], 2),
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = d.filter(F.col("vec_id") == 0)
    got = hard_negative_topk(d, q, "embedding", "vec_id", "label", k=2).collect()
    assert [r["match_id"] for r in got] == [2, 3]  # most-similar wrong-label first
    assert all(r["neg_label"] != 0 for r in got)
    assert [r["rank"] for r in got] == [1, 2]


def test_build_cdc_merge_sql_shape():
    from bioeco_portal_etl_spark.sinks.jdbc_upsert import build_cdc_merge_sql

    sql = build_cdc_merge_sql(
        "tgt", "stg", ["k"], "seq", "op", ["v"], delete_op=2
    )
    assert 'WHEN MATCHED AND s."seq" > t."seq" AND s."op" = 2 THEN DELETE' in sql
    assert 'WHEN MATCHED AND s."seq" > t."seq" THEN UPDATE SET' in sql
    assert 'WHEN NOT MATCHED AND s."op" <> 2 THEN INSERT' in sql
    # update-target list is UNQUALIFIED (Postgres 15+/Derby reject t.col)
    assert '"seq" = s."seq", "op" = s."op", "v" = s."v"' in sql


def test_stage_and_cdc_merge_derby(spark, tmp_path):
    from bioeco_portal_etl_spark.sinks.jdbc_upsert import stage_and_cdc_merge
    from bioeco_portal_etl_spark.sources.jdbc import read_jdbc_table

    url = f"jdbc:derby:{tmp_path}/cdcdb;create=true"
    empty = spark.createDataFrame([], "k long, seq long, op int, v long")
    empty.write.jdbc(url, "state", mode="overwrite")

    # batch 1: insert k=1,2; update k=1; delete k=2 (net: k=1 alive)
    b1 = spark.createDataFrame(
        [(1, 10, 0, 100), (2, 11, 0, 200), (1, 12, 1, 101), (2, 13, 2, None)],
        "k long, seq long, op int, v long",
    )
    stage_and_cdc_merge(b1, url, "state", ["k"], "seq", "op", ["v"])
    got = {r["k"]: r.asDict() for r in read_jdbc_table(spark, url, "state").collect()}
    assert set(got) == {1} and got[1]["v"] == 101 and got[1]["seq"] == 12

    # batch 2: stale update for k=1 (seq 5 < 12) must NOT regress;
    # re-insert k=2 with a fresh seq must land
    b2 = spark.createDataFrame(
        [(1, 5, 1, 999), (2, 20, 0, 201)],
        "k long, seq long, op int, v long",
    )
    stage_and_cdc_merge(b2, url, "state", ["k"], "seq", "op", ["v"])
    got = {r["k"]: r.asDict() for r in read_jdbc_table(spark, url, "state").collect()}
    assert got[1]["v"] == 101  # stale row ignored by the seq guard
    assert got[2]["v"] == 201 and got[2]["seq"] == 20
