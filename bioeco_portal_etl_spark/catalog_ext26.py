"""Round-6 catalog extensions, sixth batch — 5 entries:

- ts21_nprobe_sweep: IVF recall@5 vs exact across nprobe ∈ {1, 2, 4} —
  the tuning curve every ANN deployment reads before fixing nprobe
  (recall climbs, scan cost climbs linearly with it);
- sk12_cms_error_sweep: Count-Min overcount certified against true
  counts across widths {64, 256, 1024} — the ε ∝ 1/w error law made
  measurable (the sk10-Bloom-FPR convention applied to CMS);
- tx38_garbage_score: vowel-ratio / consonant-run garbage heuristics
  per document — the OCR-mojibake triage gate;
- mm19_channel_correlation: per-image Pearson r between RGB channel
  pairs through the REAL PNG decode — the grayscale-as-RGB /
  dead-channel detector; integer sufficient statistics with the
  sqrt(a)·sqrt(b) denominator (the int64-overflow-safe spelling);
- dq14_expectation_drift: the dq11 expectation suite evaluated on two
  time slices with per-rule pass-rate deltas — contract monitoring
  across a data boundary.

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# ts21 — IVF nprobe sweep
# ---------------------------------------------------------------------------


def ts21_nprobe_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """(nprobe, n_exact, n_hits, recall_e4): micro-averaged recall@5 of
    the ts3-configuration IVF (centroids vec_id < 8) at nprobe 1, 2, 4
    against brute-force cosine."""
    from bioeco_portal_etl_spark.catalog_ext import _query_vectors
    from bioeco_portal_etl_spark.similarity.ivf import ivf_topk
    from bioeco_portal_etl_spark.similarity.knn import cosine_topk

    e = T(spark, sf, "embeddings")
    q = _query_vectors(spark, sf)
    # persist the brute-force ground truth: all three sweep arms join
    # against it, and without the pin each arm replays the full
    # corpus × queries exact scan (round-12, guide §1.2 — don't compute
    # things three times); the table is queries × k rows, trivially
    # cached
    exact = (
        cosine_topk(e, q, "embedding", "vec_id", k=5)
        .select("query_id", "match_id")
        .persist()
    )
    out = None
    for nprobe in (1, 2, 4):
        approx = ivf_topk(
            e,
            q,
            e.filter(F.col("vec_id") < 8),
            "embedding",
            "vec_id",
            k=5,
            nprobe=nprobe,
        ).select("query_id", "match_id", F.lit(1).alias("__hit"))
        row = (
            exact.join(approx, ["query_id", "match_id"], "left")
            .agg(
                F.count(F.lit(1)).alias("n_exact"),
                F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
            )
            .select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                F.col("n_exact").cast("long").alias("n_exact"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.expr("CAST((10000 * n_hits) div n_exact AS BIGINT)").alias(
                    "recall_e4"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")


def _ts21_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_COS, _DUCK_VEC

    def arm(nprobe: int) -> str:
        return f"""
SELECT {nprobe} AS nprobe, count(*)::BIGINT AS n_exact,
       sum(coalesce(a.hit, 0))::BIGINT AS n_hits,
       CAST((10000 * sum(coalesce(a.hit, 0))) // count(*) AS BIGINT)
         AS recall_e4
FROM exact e LEFT JOIN (
  SELECT query_id, match_id, 1 AS hit FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM (
      SELECT pr.q_id AS query_id, a.cid AS match_id,
             floor(
               list_reduce(list_transform(range(1, 65),
                                          i -> pr.qe[i] * a.xe[i]),
                           (x, y) -> x + y)
               / (pr.qn * a.xn) * 10000)::BIGINT AS score_e4
      FROM (SELECT cell_id, cid AS q_id, xe AS qe, xn AS qn
            FROM ranked WHERE cid < 10 AND rk <= {nprobe}) pr
      JOIN assigned a USING (cell_id)
      WHERE pr.q_id <> a.cid))
  WHERE rank <= 5
) a USING (query_id, match_id)"""

    return f"""
WITH {_DUCK_VEC},
cent AS (SELECT vec_id AS cell_id, e, nrm FROM n WHERE vec_id < 8),
ca AS (
  SELECT x.vec_id AS cid, x.e AS xe, x.nrm AS xn, c.cell_id,
         floor(
           list_reduce(list_transform(range(1, 65), i -> x.e[i] * c.e[i]),
                       (a, b) -> a + b) / (x.nrm * c.nrm) * 10000)::BIGINT
           AS c_score
  FROM n x CROSS JOIN cent c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cid
                               ORDER BY c_score DESC, cell_id) AS rk
  FROM ca
),
assigned AS (SELECT cell_id, cid, xe, xn FROM ranked WHERE rk = 1),
fullp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({_DUCK_COS}) * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id < 10) q
  JOIN n c ON q.vec_id <> c.vec_id
),
exact AS (
  SELECT query_id, match_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM fullp)
  WHERE rank <= 5
)
SELECT * FROM ({arm(1)} UNION ALL {arm(2)} UNION ALL {arm(4)})
ORDER BY nprobe"""


# ---------------------------------------------------------------------------
# sk12 — CMS error sweep
# ---------------------------------------------------------------------------


def sk12_cms_error_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """(w, n_keys, total_true, total_over, max_over, over_rate_e6):
    Count-Min point estimates for every supplier key vs true lineitem
    counts at widths 64/256/1024 (d = 4). Overcount is one-sided by
    construction; over_rate halves-ish per width doubling — the ε ∝ 1/w
    law, certified."""
    from bioeco_portal_etl_spark.sketches.cms import cms_build, cms_estimate

    li = T(spark, sf, "lineitem")
    keys = T(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("suppkey")
    )
    true = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    out = None
    for w in (64, 256, 1024):
        grid = cms_build(li, "l_suppkey", d=4, w=w)
        est = cms_estimate(keys, grid, "suppkey", d=4, w=w)
        row = (
            est.join(true, "suppkey", "left")
            .select(
                "suppkey",
                "est_cnt",
                F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("true_cnt").alias("total_true"),
                F.sum(F.col("est_cnt") - F.col("true_cnt")).alias(
                    "total_over"
                ),
                F.max(F.col("est_cnt") - F.col("true_cnt")).alias("max_over"),
            )
            .select(
                F.lit(w).cast("long").alias("w"),
                F.col("n_keys").cast("long").alias("n_keys"),
                F.col("total_true").cast("long").alias("total_true"),
                F.col("total_over").cast("long").alias("total_over"),
                F.col("max_over").cast("long").alias("max_over"),
                F.expr(
                    "CAST((1000000 * total_over) div total_true AS BIGINT)"
                ).alias("over_rate_e6"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("w")


def _sk12_sql() -> str:
    from bioeco_portal_etl_spark.sketches.cms import duck_cms

    arms = []
    for w in (64, 256, 1024):
        body = duck_cms(
            "lineitem", "l_suppkey", "supplier", "s_suppkey", d=4, w=w
        )
        arms.append(f"""
SELECT {w} AS w, count(*)::BIGINT AS n_keys,
       sum(t.true_cnt)::BIGINT AS total_true,
       sum(e.est_cnt - t.true_cnt)::BIGINT AS total_over,
       max(e.est_cnt - t.true_cnt)::BIGINT AS max_over,
       CAST((1000000 * sum(e.est_cnt - t.true_cnt))
            // sum(t.true_cnt) AS BIGINT) AS over_rate_e6
FROM (WITH {body}
      SELECT key, est_cnt FROM cms_est) e
LEFT JOIN (SELECT l_suppkey AS key, count(*)::BIGINT AS true_cnt
           FROM lineitem GROUP BY 1) t USING (key)""")
    u = " UNION ALL ".join(f"({a})" for a in arms)
    return f"""
SELECT * FROM ({u}) ORDER BY w"""


# ---------------------------------------------------------------------------
# tx38 — garbage / mojibake heuristics
# ---------------------------------------------------------------------------


def tx38_garbage_score(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, n_letters, n_vowels, vowel_e6, max_consonant_run,
    is_garbage): the OCR-garbage triage rules — vowel share of letters
    and the longest unbroken consonant run (split on vowels and
    non-letters; both engines share the split semantics). Flag fires on
    vowel_e6 < 250000 or a run >= 8."""
    d = T(spark, sf, "documents")
    low = F.lower(F.coalesce("text", F.lit("")))
    letters = F.length(F.regexp_replace(low, "[^a-z]", ""))
    vowels = F.length(F.regexp_replace(low, "[^aeiou]", ""))
    run = F.array_max(
        F.transform(
            F.split(low, "[aeiou]|[^a-z]"), lambda s: F.length(s)
        )
    )
    vowel_e6 = F.expr(
        "CASE WHEN n_letters > 0"
        " THEN CAST((1000000 * n_vowels) div n_letters AS BIGINT) END"
    )
    return (
        d.select(
            "doc_id",
            letters.cast("long").alias("n_letters"),
            vowels.cast("long").alias("n_vowels"),
            F.coalesce(run, F.lit(0)).cast("long").alias("max_consonant_run"),
        )
        .select(
            "doc_id",
            "n_letters",
            "n_vowels",
            vowel_e6.alias("vowel_e6"),
            "max_consonant_run",
            (
                (
                    F.coalesce(vowel_e6, F.lit(0)) < 250_000
                ) | (F.col("max_consonant_run") >= 8)
            )
            .cast("long")
            .alias("is_garbage"),
        )
        .orderBy("doc_id")
    )


def _tx38_sql() -> str:
    return """
WITH base AS (
  SELECT doc_id,
         length(regexp_replace(lower(coalesce(text, '')),
                               '[^a-z]', '', 'g'))::BIGINT AS n_letters,
         length(regexp_replace(lower(coalesce(text, '')),
                               '[^aeiou]', '', 'g'))::BIGINT AS n_vowels,
         coalesce(list_max(list_transform(
             string_split_regex(lower(coalesce(text, '')),
                                '[aeiou]|[^a-z]'),
             s -> length(s))), 0)::BIGINT AS max_consonant_run
  FROM documents
),
scored AS (
  SELECT doc_id, n_letters, n_vowels,
         CASE WHEN n_letters > 0 THEN
           CAST((1000000 * n_vowels) // n_letters AS BIGINT) END AS vowel_e6,
         max_consonant_run
  FROM base
)
SELECT doc_id, n_letters, n_vowels, vowel_e6, max_consonant_run,
       (CASE WHEN coalesce(vowel_e6, 0) < 250000
              OR max_consonant_run >= 8
             THEN 1 ELSE 0 END)::BIGINT AS is_garbage
FROM scored ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# mm19 — RGB channel correlation through the real PNG decode
# ---------------------------------------------------------------------------


def mm19_channel_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson r (e4) between channel pairs for 120 synthetic RGB
    rasters through the REAL PNG round-trip — integer sufficient stats
    inside the Arrow batch, sqrt(a)·sqrt(b) denominator (the gr16
    overflow-safe spelling). Grayscale-as-RGB uploads show r = 1 on all
    pairs; a dead channel shows NULL (zero variance)."""
    from bioeco_portal_etl_spark.multimodal.media import (
        channel_correlation,
        synth_rgb_png,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 120)
    )
    return channel_correlation(synth_rgb_png(ids, "doc_id")).orderBy(
        "media_id", "pair"
    )


def _mm19_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
dims AS (
  SELECT doc_id,
         {SYNTH_W_BASE} + doc_id % {SYNTH_W_MOD} AS w,
         {SYNTH_H_BASE} + doc_id % {SYNTH_H_MOD} AS h
  FROM ids
),
xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
ys AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
px AS (
  SELECT doc_id,
         (doc_id * 7 + x * 3 + y * 5 + 0 * 11) % 256 AS r,
         (doc_id * 7 + x * 3 + y * 5 + 1 * 11) % 256 AS g,
         (doc_id * 7 + x * 3 + y * 5 + 2 * 11) % 256 AS b
  FROM ys
),
stats AS (
  SELECT doc_id, p.pair,
         count(*)::BIGINT AS n,
         sum(CASE p.pair WHEN 'gb' THEN g ELSE r END)::BIGINT AS sx,
         sum(CASE p.pair WHEN 'rg' THEN g ELSE b END)::BIGINT AS sy,
         sum(CASE p.pair WHEN 'gb' THEN g * g ELSE r * r END)::BIGINT AS sxx,
         sum(CASE p.pair WHEN 'rg' THEN g * g ELSE b * b END)::BIGINT AS syy,
         sum(CASE p.pair WHEN 'rg' THEN r * g
                         WHEN 'rb' THEN r * b
                         ELSE g * b END)::BIGINT AS sxy
  FROM px, (VALUES ('rg'), ('rb'), ('gb')) p(pair)
  GROUP BY doc_id, p.pair
)
SELECT doc_id AS media_id, pair,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
         CAST(floor(10000 * (n * sxy - sx * sy)
              / (sqrt((n * sxx - sx * sx)::DOUBLE)
                 * sqrt((n * syy - sy * sy)::DOUBLE))) AS BIGINT) END
         AS r_e4
FROM stats ORDER BY media_id, pair"""


# ---------------------------------------------------------------------------
# dq14 — expectation drift across a time boundary
# ---------------------------------------------------------------------------


def dq14_expectation_drift(spark: SparkSession, sf: str) -> DataFrame:
    """The dq11 rule set evaluated on orders BEFORE vs FROM 1998-01-01,
    per-rule pass rates and signed deltas — one scan, slice-conditional
    sums (operators/quality.py expectation_suite run per slice)."""
    from bioeco_portal_etl_spark.operators.quality import expectation_suite

    o = T(spark, sf, "orders").withColumn(
        "__slice",
        F.when(
            F.col("o_orderdate").cast("date") < F.lit("1998-01-01"),
            F.lit("a"),
        ).otherwise(F.lit("b")),
    )
    rules = [
        ("price_positive", F.col("o_totalprice") > 0),
        ("price_under_300k", F.col("o_totalprice") < 300_000),
        ("priority_known", F.col("o_orderpriority").isNotNull()),
        ("custkey_present", F.col("o_custkey").isNotNull()),
    ]
    a = expectation_suite(o.filter(F.col("__slice") == "a"), rules).select(
        "check",
        F.col("n_rows").alias("n_a"),
        F.col("pass_e6").alias("pass_a_e6"),
    )
    b = expectation_suite(o.filter(F.col("__slice") == "b"), rules).select(
        "check",
        F.col("n_rows").alias("n_b"),
        F.col("pass_e6").alias("pass_b_e6"),
    )
    return (
        a.join(b, "check")
        .select(
            "check",
            "n_a",
            "pass_a_e6",
            "n_b",
            "pass_b_e6",
            (F.col("pass_b_e6") - F.col("pass_a_e6")).alias("delta_e6"),
        )
        .orderBy("check")
    )


def _dq14_sql() -> str:
    rules = [
        ("price_positive", "o_totalprice > 0"),
        ("price_under_300k", "o_totalprice < 300000"),
        ("priority_known", "o_orderpriority IS NOT NULL"),
        ("custkey_present", "o_custkey IS NOT NULL"),
    ]
    cells = []
    for name, pred in rules:
        cells.append(
            f"SELECT '{name}' AS check_name,"
            f" sum(CASE WHEN sl = 'a' THEN 1 ELSE 0 END) AS n_a,"
            f" sum(CASE WHEN sl = 'a' AND ({pred}) THEN 1 ELSE 0 END) AS p_a,"
            f" sum(CASE WHEN sl = 'b' THEN 1 ELSE 0 END) AS n_b,"
            f" sum(CASE WHEN sl = 'b' AND ({pred}) THEN 1 ELSE 0 END) AS p_b"
            f" FROM sliced"
        )
    u = " UNION ALL ".join(cells)
    return f"""
WITH sliced AS (
  SELECT *, CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
                 THEN 'a' ELSE 'b' END AS sl
  FROM orders
),
cells AS ({u})
SELECT check_name AS "check",
       CAST(n_a AS BIGINT) AS n_a,
       CASE WHEN n_a > 0
            THEN CAST((1000000 * p_a) // n_a AS BIGINT) END AS pass_a_e6,
       CAST(n_b AS BIGINT) AS n_b,
       CASE WHEN n_b > 0
            THEN CAST((1000000 * p_b) // n_b AS BIGINT) END AS pass_b_e6,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST((1000000 * p_b) // n_b AS BIGINT)
           - CAST((1000000 * p_a) // n_a AS BIGINT) END AS delta_e6
FROM cells ORDER BY "check" """


CATALOG_EXT26 = {
    "ts21_nprobe_sweep": (ts21_nprobe_sweep, _ts21_sql()),
    "sk12_cms_error_sweep": (sk12_cms_error_sweep, _sk12_sql()),
    "tx38_garbage_score": (tx38_garbage_score, _tx38_sql()),
    "mm19_channel_correlation": (mm19_channel_correlation, _mm19_sql()),
    "dq14_expectation_drift": (dq14_expectation_drift, _dq14_sql()),
}
