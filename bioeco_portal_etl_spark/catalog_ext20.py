"""Catalog extension 20 — round-5 seventeenth batch.

- gr16_assortativity: Newman degree assortativity (graph/degrees.py
  degree_assortativity) — do hubs link to hubs? Pearson r over edge
  endpoint degrees with exact integer sufficient statistics;
- x39_consistent_hashing: consistent-hash ring sharding
  (operators/sharding.py) — per-shard balance under ring(N) and
  ring(N+1) plus the MOVEMENT certificate (~1/(N+1) keys move, the
  property modulo sharding lacks); md5-exact ring and key positions;
- sk10_bloom_fpr: measured vs theoretical Bloom false-positive rate
  (sketches/bloom_md5.py) — the filter built on one key population,
  probed with a provably disjoint one; measured fpr_e6 next to the
  floor-e4 (1 - e^(-kn/m))^k bound (certified-approximation pattern);
- ts18_ann_cascade: IVF fast path + exact fallback for low-confidence
  queries (similarity/cascade.py) — per-query routing with an auditable
  'path' column; recall restored exactly where the index lost it;
- mm13_frame_zcr: frame-level zero-crossing rate + energy through the
  REAL WAV codec (multimodal/media.py wav_frame_zcr) — the
  voiced/unvoiced front-end features, oracle recomputed from the
  synth_pcm_wav sample formula.

Same contract as catalog.py: (spark_fn, oracle_sql) pairs, identical
aliases both sides, deterministic ORDER BY, integer surfaces BIGINT-cast
per PORTABILITY.md (machine-enforced by tests/oracle.py's type lint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# gr16 — degree assortativity
# ---------------------------------------------------------------------------


def gr16_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity of the (symmetric) supplier chain graph —
    one row (graph/degrees.py degree_assortativity)."""
    from bioeco_portal_etl_spark.graph.degrees import degree_assortativity

    from bioeco_portal_etl_spark.catalog_ext2 import _chain_supplier_edges

    edges = _chain_supplier_edges(spark, sf)
    return degree_assortativity(edges).orderBy("m_edges")


def _gr16_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext2 import _CHAIN_EDGES_SQL

    return f"""
WITH e AS ({_CHAIN_EDGES_SQL}),
deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
pairs AS (
  SELECT dx.d AS dx, dy.d AS dy
  FROM e JOIN deg dx ON dx.node = e.src JOIN deg dy ON dy.node = e.dst
),
agg AS (
  SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
         sum(dx * dy) AS sxy, sum(dx * dx) AS sxx, sum(dy * dy) AS syy
  FROM pairs
)
SELECT CAST(m AS BIGINT) AS m_edges,
       CAST(sx AS BIGINT) AS sum_dx, CAST(sy AS BIGINT) AS sum_dy,
       CAST(floor((m * sxy - sx * sy)
            / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy))
            * 1000000) AS BIGINT) AS assortativity_e6
FROM agg ORDER BY m_edges"""


# ---------------------------------------------------------------------------
# x39 — consistent-hash ring sharding
# ---------------------------------------------------------------------------

_RING_N, _RING_V = 4, 16


def x39_consistent_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """Ring(4) balance + the ring(4)->ring(5) movement certificate over
    customer keys: per-shard rows under both rings plus the moved
    fraction, stacked into one audit table (operators/sharding.py)."""
    from bioeco_portal_etl_spark.operators.sharding import (
        hash_ring,
        resharding_report,
        ring_assign,
    )

    keys = T(spark, sf, "customer").select("c_custkey")
    ring_a = hash_ring(spark, _RING_N, _RING_V)
    ring_b = hash_ring(spark, _RING_N + 1, _RING_V)
    bal_a = (
        ring_assign(keys, "c_custkey", ring_a)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("ring4").alias("ring"),
            F.col("shard").cast("long").alias("shard"),
            F.col("n").cast("long").alias("n_keys"),
        )
    )
    bal_b = (
        ring_assign(keys, "c_custkey", ring_b)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("ring5").alias("ring"),
            F.col("shard").cast("long").alias("shard"),
            F.col("n").cast("long").alias("n_keys"),
        )
    )
    moved = resharding_report(keys, "c_custkey", ring_a, ring_b).select(
        F.lit("moved").alias("ring"),
        F.lit(-1).cast("long").alias("shard"),
        F.col("moved_e6").alias("n_keys"),
    )
    return bal_a.unionByName(bal_b).unionByName(moved).orderBy("ring", "shard")


def _x39_sql() -> str:
    from bioeco_portal_etl_spark.operators.sharding import (
        duck_ring,
        duck_ring_assign,
    )

    keys = "SELECT c_custkey AS k FROM customer"
    return f"""
WITH {duck_ring(_RING_N, _RING_V)},
{duck_ring(_RING_N + 1, _RING_V)},
{duck_ring_assign(keys, f"ring_{_RING_N}", "asg_a")},
{duck_ring_assign(keys, f"ring_{_RING_N + 1}", "asg_b")},
bal AS (
  SELECT 'ring4' AS ring, shard, count(*)::BIGINT AS n_keys
  FROM asg_a GROUP BY shard
  UNION ALL
  SELECT 'ring5', shard, count(*)::BIGINT FROM asg_b GROUP BY shard
),
mv AS (
  SELECT 'moved' AS ring, CAST(-1 AS BIGINT) AS shard,
         CAST((1000000 * sum(CASE WHEN a.shard != b.shard THEN 1 ELSE 0 END))
              // count(*) AS BIGINT) AS n_keys
  FROM asg_a a JOIN asg_b b USING (k)
)
SELECT ring, shard, n_keys FROM bal
UNION ALL SELECT ring, shard, n_keys FROM mv
ORDER BY ring, shard"""


# ---------------------------------------------------------------------------
# sk10 — Bloom false-positive-rate certificate
# ---------------------------------------------------------------------------

_BF_M, _BF_K = 4096, 3


def sk10_bloom_fpr(spark: SparkSession, sf: str) -> DataFrame:
    """Build the md5 Bloom filter on even customer keys, probe with a
    DISJOINT population (odd keys shifted by 1e9 — no string collides
    with any inserted key), and report measured fpr_e6 next to the
    floor-e4 theoretical (1 - e^(-kn/m))^k bound. One row."""
    from bioeco_portal_etl_spark.sketches.bloom_md5 import (
        bloom_build_md5,
        bloom_contains_md5,
    )

    c = T(spark, sf, "customer")
    hist = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("key")
    ).distinct()
    probe = c.filter(F.col("c_custkey") % 2 == 1).select(
        (F.col("c_custkey") + 1_000_000_000).alias("key")
    ).distinct()
    bloom = bloom_build_md5(hist, "key", _BF_M, _BF_K)
    probed = bloom_contains_md5(probe, bloom, "key", _BF_M, _BF_K)
    n_ins = hist.agg(F.count(F.lit(1)).alias("n_inserted"))
    agg = probed.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("possibly_seen").cast("long")).alias("n_false_pos"),
    )
    out = agg.crossJoin(F.broadcast(n_ins))
    load = F.col("n_inserted") * _BF_K / F.lit(float(_BF_M))
    one_bit = 1 - F.exp(-load)
    theory = F.floor(one_bit * one_bit * one_bit * 10000).cast("long")
    return out.select(
        F.col("n_inserted").cast("long").alias("n_inserted"),
        F.col("n_probed").cast("long").alias("n_probed"),
        F.col("n_false_pos").cast("long").alias("n_false_pos"),
        F.expr("CAST((1000000 * n_false_pos) div n_probed AS BIGINT)").alias(
            "fpr_e6"
        ),
        theory.alias("theory_fpr_e4"),
    ).orderBy("n_inserted")


def _sk10_sql() -> str:
    from bioeco_portal_etl_spark.sketches.bloom_md5 import duck_bloom

    body = duck_bloom(
        "SELECT DISTINCT c_custkey AS key FROM customer WHERE c_custkey % 2 = 0",
        "(SELECT DISTINCT c_custkey + 1000000000 AS key FROM customer"
        " WHERE c_custkey % 2 = 1)",
        "key",
        _BF_M,
        _BF_K,
    )
    return f"""
WITH {body.lstrip()},
ins AS (
  SELECT count(DISTINCT c_custkey) AS n_inserted FROM customer
  WHERE c_custkey % 2 = 0
),
pr AS (
  SELECT count(*) AS n_probed,
         sum(CASE WHEN possibly_seen THEN 1 ELSE 0 END) AS n_false_pos
  FROM bloomed
)
SELECT CAST(n_inserted AS BIGINT) AS n_inserted,
       CAST(n_probed AS BIGINT) AS n_probed,
       CAST(n_false_pos AS BIGINT) AS n_false_pos,
       CAST((1000000 * n_false_pos) // n_probed AS BIGINT) AS fpr_e6,
       CAST(floor((1 - exp(-(n_inserted * {_BF_K} / {float(_BF_M)})))
                  * (1 - exp(-(n_inserted * {_BF_K} / {float(_BF_M)})))
                  * (1 - exp(-(n_inserted * {_BF_K} / {float(_BF_M)})))
                  * 10000) AS BIGINT) AS theory_fpr_e4
FROM pr CROSS JOIN ins
ORDER BY n_inserted"""


# ---------------------------------------------------------------------------
# ts18 — ANN cascade (IVF + exact fallback)
# ---------------------------------------------------------------------------

_CASCADE_T = 3600


def ts18_ann_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Routed retrieval: IVF (nprobe=1) results for queries whose best
    score clears 0.36, exact top-5 for the rest; the 'path' column
    audits the fallback rate (similarity/cascade.py)."""
    from bioeco_portal_etl_spark.similarity.cascade import (
        ann_with_exact_fallback,
    )

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ann_with_exact_fallback(
        e,
        q,
        e.filter(F.col("vec_id") < 8),
        "embedding",
        "vec_id",
        k=5,
        nprobe=1,
        min_best_e4=_CASCADE_T,
    ).orderBy("query_id", "rank")


def _ts18_sql() -> str:
    from bioeco_portal_etl_spark.catalog_ext import _DUCK_COS, _DUCK_VEC

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
rankedc AS (
  SELECT *, row_number() OVER (PARTITION BY cid
                               ORDER BY c_score DESC, cell_id) AS rk
  FROM ca
),
assigned AS (SELECT cell_id, cid, xe, xn FROM rankedc WHERE rk = 1),
probes AS (
  SELECT cell_id, cid AS q_id, xe AS qe, xn AS qn
  FROM rankedc WHERE cid < 10 AND rk <= 1
),
ivfp AS (
  SELECT pr.q_id AS query_id, a.cid AS match_id,
         floor(
           list_reduce(list_transform(range(1, 65), i -> pr.qe[i] * a.xe[i]),
                       (x, y) -> x + y) / (pr.qn * a.xn) * 10000)::BIGINT
           AS score_e4
  FROM probes pr JOIN assigned a USING (cell_id)
  WHERE pr.q_id <> a.cid
),
ivf AS (
  SELECT query_id, match_id, score_e4, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM ivfp)
  WHERE rank <= 5
),
best AS (SELECT query_id, max(score_e4) AS best FROM ivf GROUP BY query_id),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
low AS (
  SELECT q.query_id FROM qids q LEFT JOIN best b USING (query_id)
  WHERE b.best IS NULL OR b.best < {_CASCADE_T}
),
exactp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         floor(({_DUCK_COS}) * 10000)::BIGINT AS score_e4
  FROM (SELECT * FROM n WHERE vec_id IN (SELECT query_id FROM low)) q
  JOIN n c ON q.vec_id <> c.vec_id
),
exact AS (
  SELECT query_id, match_id, score_e4, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, match_id) AS rank
    FROM exactp)
  WHERE rank <= 5
)
SELECT query_id, match_id, score_e4, rank, 'ivf' AS path FROM ivf
WHERE query_id NOT IN (SELECT query_id FROM low)
UNION ALL
SELECT query_id, match_id, score_e4, rank, 'exact' AS path FROM exact
ORDER BY query_id, rank"""


# ---------------------------------------------------------------------------
# mm13 — frame-level ZCR through the real WAV codec
# ---------------------------------------------------------------------------


def mm13_frame_zcr(spark: SparkSession, sf: str) -> DataFrame:
    """Frame ZCR + energy for 120 synthetic PCM clips through the real
    RIFF round-trip (multimodal/media.py wav_frame_zcr), 160-sample
    frames."""
    from bioeco_portal_etl_spark.multimodal.media import (
        synth_pcm_wav,
        wav_frame_zcr,
    )

    ids = (
        T(spark, sf, "documents").select("doc_id").filter(F.col("doc_id") < 120)
    )
    return wav_frame_zcr(synth_pcm_wav(ids, "doc_id"), frame=160).orderBy(
        "media_id", "frame_id"
    )


def _mm13_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_N_BASE,
        SYNTH_N_MOD,
    )

    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
dims AS (
  SELECT doc_id, {SYNTH_N_BASE} + doc_id % {SYNTH_N_MOD} AS n FROM ids
),
samples AS (
  SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims
),
vals AS (
  SELECT doc_id, i, i // 160 AS frame_id,
         (doc_id * 13 + i * 7) % 2048 - 1024 AS s,
         CASE WHEN (i + 1) % 160 != 0 AND i + 1 < n
              THEN (doc_id * 13 + (i + 1) * 7) % 2048 - 1024 END AS s_next
  FROM samples
)
SELECT doc_id AS media_id, frame_id,
       count(*)::BIGINT AS n_samples,
       sum(CASE WHEN s * s_next < 0 THEN 1 ELSE 0 END)::BIGINT AS zcr,
       sum(s * s)::BIGINT AS energy
FROM vals GROUP BY doc_id, frame_id
ORDER BY media_id, frame_id"""


CATALOG_EXT20 = {
    "gr16_assortativity": (gr16_assortativity, _gr16_sql()),
    "x39_consistent_hashing": (x39_consistent_hashing, _x39_sql()),
    "sk10_bloom_fpr": (sk10_bloom_fpr, _sk10_sql()),
    "ts18_ann_cascade": (ts18_ann_cascade, _ts18_sql()),
    "mm13_frame_zcr": (mm13_frame_zcr, _mm13_sql()),
}
