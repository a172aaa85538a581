"""Round-7 first batch — 5 oracle-checked entries:

- mm23_jpeg_color_roundtrip: per-channel pixel statistics through a REAL
  baseline 4:4:4 YCbCr COLOR JPEG encode->decode round-trip
  (multimodal/jpeg.py encode_jpeg_color/decode_jpeg — VERDICT r6 #6).
  Tile-constant RGB + all-ones quantization make the codec path exactly
  the pinned double conversion ycbcr_to_rgb(rgb_to_ycbcr(px)), which the
  oracle mirrors literal-for-literal in SQL — a hash match certifies
  three interleaved Huffman/DPCM/IDCT pipelines plus both color
  conversions end-to-end;
- td16_minhash_error_sweep: measured MinHash estimator error law —
  |est - true| Jaccard over all doc pairs at signature lengths 2/4/8
  from ONE 8-permutation signature pass (prefix estimates; error should
  fall ~1/sqrt(k)); the dedupe-family twin of sk12's CMS eps-sweep;
- tx41_rank_stability: shard linguistic exchangeability — Spearman rank
  correlation between the term-frequency rankings of the even/odd doc_id
  halves over their top-200 shared terms (all-integer until one final
  floored division); the vocabulary-axis twin of dq3/dq12 split QA;
- ts25_dim_covariance: adjacent-dimension covariance profile of the
  embedding corpus (cov(v_i, v_{i+1}) for i in 0..62) in one pass —
  e5-quantize-then-integer-sum keeps n*sxy and sx*sy far from int64
  edges at any SF;
- x49_poisson_bootstrap: Poisson(1) bootstrap CI for the order-value
  mean — THE at-scale resampling technique (each of B=32 resamples is a
  deterministic per-row weight draw, so the whole bootstrap is one
  explode + one aggregation, no per-resample pass over the data).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# mm23 — color JPEG round-trip channel stats
# ---------------------------------------------------------------------------


def mm23_jpeg_color_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Per-channel stats through the REAL color codec: block-constant RGB
    tilings are encoded to genuine baseline 4:4:4 YCbCr JPEG bytes and
    fully decoded (3 interleaved Huffman/DPCM/IDCT pipelines + pinned
    YCbCr<->RGB) before the reduction. decode(encode(px)) ==
    ycbcr_to_rgb(rgb_to_ycbcr(px)) exactly for tile-constant rasters
    (multimodal/jpeg.py docstring has the argument), so the oracle
    recomputes the DOUBLE CONVERSION with pure SQL arithmetic and a hash
    match certifies the color decoder end-to-end."""
    from bioeco_portal_etl_spark.multimodal.media import (
        png_channel_stats,
        synth_rgb_jpeg,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 120)
    )
    return png_channel_stats(synth_rgb_jpeg(ids, "doc_id")).orderBy(
        "media_id", "channel"
    )


def _mm23_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        JPEG_H_BASE,
        JPEG_H_MOD,
        JPEG_W_BASE,
        JPEG_W_MOD,
    )

    # The pinned conversion pair from multimodal/jpeg.py, literal for
    # literal and in the same operation order (IEEE doubles make the two
    # engines bit-identical): forward y/cb/cr with floor(v+0.5) clamp,
    # inverse r0/b0 direct and g0 re-derived from the luma equation.
    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
dims AS (
  SELECT doc_id,
         {JPEG_W_BASE} + doc_id % {JPEG_W_MOD} AS w,
         {JPEG_H_BASE} + doc_id % {JPEG_H_MOD} AS h
  FROM ids
),
xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
ys AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
rgb AS (
  SELECT doc_id, x, y,
         (doc_id * 31 + (x // 8) * 7 + (y // 8) * 11) % 256 AS r,
         (doc_id * 31 + (x // 8) * 7 + (y // 8) * 11 + 17) % 256 AS g,
         (doc_id * 31 + (x // 8) * 7 + (y // 8) * 11 + 34) % 256 AS b
  FROM ys
),
fwd0 AS (
  SELECT doc_id, x, y, r, g, b,
         0.299 * r + 0.587 * g + 0.114 * b AS y0
  FROM rgb
),
ycc AS (
  SELECT doc_id, x, y,
         greatest(0, least(255, floor(y0 + 0.5)))::BIGINT AS yq,
         greatest(0, least(255,
           floor(128.0 + (b - y0) / 1.772 + 0.5)))::BIGINT AS cbq,
         greatest(0, least(255,
           floor(128.0 + (r - y0) / 1.402 + 0.5)))::BIGINT AS crq
  FROM fwd0
),
inv0 AS (
  SELECT doc_id, x, y, yq,
         yq + 1.402 * (crq - 128) AS r0,
         yq + 1.772 * (cbq - 128) AS b0
  FROM ycc
),
back AS (
  SELECT doc_id, x, y,
         greatest(0, least(255, floor(r0 + 0.5)))::BIGINT AS rr,
         greatest(0, least(255,
           floor((yq - 0.299 * r0 - 0.114 * b0) / 0.587 + 0.5)))::BIGINT AS gg,
         greatest(0, least(255, floor(b0 + 0.5)))::BIGINT AS bb
  FROM inv0
),
chan AS (
  SELECT doc_id, x, y, rr, gg, bb, unnest(range(0, 3)) AS c FROM back
),
px AS (
  SELECT doc_id, c,
         CASE c WHEN 0 THEN rr WHEN 1 THEN gg ELSE bb END AS v
  FROM chan
)
SELECT doc_id AS media_id, c::BIGINT AS channel,
       count(*)::BIGINT AS n_px,
       CAST(sum(v) // count(*) AS BIGINT) AS mean_v,
       min(v)::BIGINT AS min_v,
       max(v)::BIGINT AS max_v
FROM px
GROUP BY doc_id, c
ORDER BY media_id, channel"""


# ---------------------------------------------------------------------------
# td16 — MinHash estimator error sweep
# ---------------------------------------------------------------------------

_TD16_KS = (2, 4, 8)


def td16_minhash_error_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Error law of the MinHash Jaccard estimator, measured: one
    8-permutation signature pass over the first 40 docs, prefix
    signatures of length 2/4/8 estimate every pair's Jaccard, and the
    exact distinct-shingle Jaccard certifies the error per sweep point.
    Mean |err| should fall roughly as 1/sqrt(k) — the measured-error-law
    convention of sk12 (CMS) and sk13 (histogram quantiles) applied to
    the dedupe family's core sketch. ONE shuffle builds the signatures
    (min() aggregates) and the exact arm reuses the persisted gram
    stream (the recompute-once rule). Like td12_lsh_quality, this is an
    AUDIT operator: the exact arm is all-pairs by definition, so at
    production scale it runs on a bounded document slice (here: the
    first 40 ids)."""
    docs = (
        T(spark, sf, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    return minhash_error_sweep_frame(docs)


def minhash_error_sweep_frame(docs: DataFrame) -> DataFrame:
    """Frame-level body of td16 over a (doc_id, text) slice."""
    from bioeco_portal_etl_spark.text.dedupe import (
        minhash_signature_cols,
        shingle_hash,
        shingled,
    )

    sh = shingled(docs, "doc_id", "text", 3)
    grams = sh.select("doc_id", F.explode("sh").alias("s")).persist()
    hashed = grams.select("doc_id", shingle_hash("s").alias("h"))
    sig = hashed.groupBy("doc_id").agg(
        *minhash_signature_cols(F.col("h"), 8)
    )
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"_m{p}").alias(f"a{p}") for p in range(8)],
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"_m{p}").alias(f"b{p}") for p in range(8)],
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    for k in _TD16_KS:
        matches = sum(
            (F.col(f"a{p}") == F.col(f"b{p}")).cast("long") for p in range(k)
        )
        # k is a power of two, so the double division is exact and the
        # long cast equals the oracle's integer // floor (non-negative)
        pairs = pairs.withColumn(
            f"est{k}", (matches * 1000000 / F.lit(k)).cast("long")
        )
    # exact arm: distinct shingle sets (grams already distinct per doc —
    # shingled() emits the de-duplicated shingle SET)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        grams.alias("x")
        .join(grams.alias("y"), "s")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter_sz"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb"))
    exact = (
        pairs.select("id_a", "id_b", *[f"est{k}" for k in _TD16_KS])
        .join(F.broadcast(inter), ["id_a", "id_b"], "left")
        .join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "true_e6",
            F.when(
                F.coalesce(F.col("inter_sz"), F.lit(0)) > 0,
                (
                    F.lit(1000000)
                    * F.col("inter_sz")
                    / (F.col("sza") + F.col("szb") - F.col("inter_sz"))
                ).cast("long"),
            ).otherwise(F.lit(0)),
        )
    )
    sweep = exact.select(
        "id_a",
        "id_b",
        "true_e6",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("num_perm"),
                        F.col(f"est{k}").alias("est_e6"),
                    )
                    for k in _TD16_KS
                ]
            )
        ).alias("kv"),
    ).select(
        F.col("kv.num_perm").alias("num_perm"),
        F.abs(F.col("kv.est_e6") - F.col("true_e6")).alias("err"),
    )
    return (
        sweep.groupBy("num_perm")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum("err") / F.count(F.lit(1)))
            .cast("long")
            .alias("mean_abs_err_e6"),
            F.max("err").alias("max_abs_err_e6"),
        )
        .orderBy("num_perm")
    )


def _td16_sql() -> str:
    from bioeco_portal_etl_spark.text.dedupe import MERSENNE31, PERM_A, PERM_B
    from bioeco_portal_etl_spark.text.tokenize import duck_shingles, duck_tokens

    arr = duck_shingles(duck_tokens("text"), 3, distinct=True)
    sig_cols = ", ".join(
        f"min(({PERM_A[p]} * h + {PERM_B[p]}) % {MERSENNE31}) AS m{p}"
        for p in range(8)
    )
    est_cols = ", ".join(
        "CAST((1000000 * ("
        + " + ".join(
            f"CASE WHEN a.m{p} = b.m{p} THEN 1 ELSE 0 END" for p in range(k)
        )
        + f")) // {k} AS BIGINT) AS est{k}"
        for k in _TD16_KS
    )
    sweep_union = " UNION ALL ".join(
        f"SELECT {k}::BIGINT AS num_perm, abs(est{k} - true_e6) AS err FROM j"
        for k in _TD16_KS
    )
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
grams AS (
  SELECT doc_id, unnest({arr}) AS s FROM docs
),
h AS (
  SELECT doc_id,
         list_reduce(list_transform(range(1, 16),
             i -> strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1),
           (a, b) -> a * 16 + b) % {MERSENNE31} AS h
  FROM grams
),
sig AS (SELECT doc_id, {sig_cols} FROM h GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, {est_cols}
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*)::BIGINT AS inter_sz
  FROM grams x JOIN grams y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
j AS (
  SELECT p.*,
         CASE WHEN coalesce(i.inter_sz, 0) > 0
              THEN CAST((1000000 * i.inter_sz)
                        // (sa.sz + sb.sz - i.inter_sz) AS BIGINT)
              ELSE 0 END AS true_e6
  FROM pairs p
  LEFT JOIN inter i USING (id_a, id_b)
  JOIN sz sa ON sa.doc_id = p.id_a
  JOIN sz sb ON sb.doc_id = p.id_b
),
sweep AS ({sweep_union})
SELECT num_perm, count(*)::BIGINT AS n_pairs,
       CAST(sum(err) // count(*) AS BIGINT) AS mean_abs_err_e6,
       max(err)::BIGINT AS max_abs_err_e6
FROM sweep GROUP BY num_perm ORDER BY num_perm"""


# ---------------------------------------------------------------------------
# tx41 — shard rank-stability (Spearman over term rankings)
# ---------------------------------------------------------------------------


def tx41_rank_stability(spark: SparkSession, sf: str) -> DataFrame:
    """Are two shards of the corpus linguistically exchangeable? Spearman
    rank correlation between the term-frequency RANKINGS of the
    even-doc_id and odd-doc_id halves, over their top-200 shared terms —
    the split-QA twin of dq3 (leakage) and dq12 (stratum balance) for
    the vocabulary axis: rho near 1e6 means any half trains like the
    whole; a low rho flags a content-skewed shard assignment. Entirely
    integer arithmetic (counts, ranks, d^2 sums) until one final IEEE
    division inside a floor."""
    return rank_stability_frame(
        T(spark, sf, "documents").select("doc_id", "text")
    )


def rank_stability_frame(docs: DataFrame) -> DataFrame:
    """Frame-level body of tx41 over a (doc_id, text) projection."""
    from bioeco_portal_etl_spark.text.tokenize import tokens

    terms = (
        docs.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(tokens(F.col("text"))).alias("t"),
        )
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
        )
        .filter((F.col("ca") > 0) & (F.col("cb") > 0))
    )
    # bounded surface: top-200 shared terms by combined count — a
    # TakeOrdered heap, never a vocabulary-wide sort
    top = terms.orderBy(
        F.desc(F.col("ca") + F.col("cb")), F.asc("t")
    ).limit(200)
    ranked = top.select(
        "t",
        F.row_number()
        .over(Window.orderBy(F.desc("ca"), F.asc("t")))
        .cast("long")
        .alias("ra"),
        F.row_number()
        .over(Window.orderBy(F.desc("cb"), F.asc("t")))
        .cast("long")
        .alias("rb"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
        ).alias("d2"),
    )
    return agg.select(
        F.col("n").alias("n_common_terms"),
        F.col("d2").alias("d2_sum"),
        F.floor(
            (
                F.lit(1.0)
                - F.lit(6.0)
                * F.col("d2").cast("double")
                / (F.col("n") * (F.col("n") * F.col("n") - 1)).cast("double")
            )
            * 1000000.0
        )
        .cast("long")
        .alias("spearman_e6"),
    )


def _tx41_sql() -> str:
    from bioeco_portal_etl_spark.text.tokenize import duck_tokens

    return f"""
WITH toks AS (
  SELECT doc_id % 2 AS half, unnest({duck_tokens("text")}) AS t
  FROM documents
),
terms AS (
  SELECT t,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM toks GROUP BY t
  HAVING ca > 0 AND cb > 0
),
top AS (
  SELECT t, ca, cb FROM terms ORDER BY ca + cb DESC, t ASC LIMIT 200
),
ranked AS (
  SELECT t,
         row_number() OVER (ORDER BY ca DESC, t ASC)::BIGINT AS ra,
         row_number() OVER (ORDER BY cb DESC, t ASC)::BIGINT AS rb
  FROM top
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum((ra - rb) * (ra - rb))::BIGINT AS d2
  FROM ranked
)
SELECT n AS n_common_terms, d2 AS d2_sum,
       floor((1.0 - 6.0 * CAST(d2 AS DOUBLE)
              / CAST(n * (n * n - 1) AS DOUBLE)) * 1000000.0)::BIGINT
         AS spearman_e6
FROM agg"""


# ---------------------------------------------------------------------------
# ts25 — adjacent-dimension covariance profile
# ---------------------------------------------------------------------------


def ts25_dim_covariance(spark: SparkSession, sf: str) -> DataFrame:
    """cov(v_i, v_{i+1}) for i in 0..62 over the embedding corpus — the
    dimension-correlation diagnostic read before PQ subspace slicing
    (strongly covarying adjacent dims argue for rotation before product
    quantization). One pass: e5-quantize each coordinate to BIGINT, then
    integer moment sums per dim (order-exact). The n*sxy - sx*sy
    combination is computed in DOUBLE on both engines: with the n<=1e5
    vector cap and unit-norm coords, n*sxy is ~1.6e18 (only ~6x int64
    headroom) and the |xq|<=1e5 worst case is 1e20 — int64 would wrap
    on Spark and error on DuckDB; the sums themselves (|sxy|<=1.6e13,
    |sx|,|sy|<=1e10) are < 2^53 so the double products round
    identically on both engines and the result is floored anyway."""
    emb = T(spark, sf, "embeddings").filter(F.col("vec_id") < 100000)
    return dim_covariance_frame(emb)


def dim_covariance_frame(emb: DataFrame) -> DataFrame:
    """Frame-level body of ts25 over a (vec_id, embedding) frame."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pair = F.zip_with(
        F.slice(v, 1, 63),
        F.slice(v, 2, 63),
        lambda a, b: F.struct(
            F.floor(a * 100000.0).cast("long").alias("xq"),
            F.floor(b * 100000.0).cast("long").alias("yq"),
        ),
    )
    long_form = emb.select(F.posexplode(pair).alias("dim", "p")).select(
        F.col("dim").cast("long").alias("dim"),
        F.col("p.xq").alias("xq"),
        F.col("p.yq").alias("yq"),
    )
    agg = long_form.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
    )
    return agg.select(
        "dim",
        F.col("n").alias("n_vecs"),
        F.floor(
            (
                F.col("sxy").cast("double") * F.col("n")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.col("n")
            / F.col("n")
            / 1000000.0
        )
        .cast("long")
        .alias("cov_e4"),
    ).orderBy("dim")


def _ts25_sql() -> str:
    return """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100000),
dims AS (SELECT vec_id, embedding, unnest(range(0, 63)) AS dim FROM e),
q AS (
  SELECT dim,
         floor(CAST(embedding[dim + 1] AS DOUBLE) * 100000.0)::BIGINT AS xq,
         floor(CAST(embedding[dim + 2] AS DOUBLE) * 100000.0)::BIGINT AS yq
  FROM dims
),
agg AS (
  SELECT dim, count(*)::BIGINT AS n,
         sum(xq)::BIGINT AS sx, sum(yq)::BIGINT AS sy,
         sum(xq * yq)::BIGINT AS sxy
  FROM q GROUP BY dim
)
SELECT dim::BIGINT AS dim, n AS n_vecs,
       floor((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
             / n / n / 1000000.0)::BIGINT
         AS cov_e4
FROM agg ORDER BY dim"""


# ---------------------------------------------------------------------------
# x49 — Poisson bootstrap CI
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds (cumulative e^-1/k!), Python reprs so
# both engines floor at identical boundaries.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)
_B = 32


def _pois_case(u_expr: str) -> str:
    whens = " ".join(
        f"WHEN {u_expr} < {p} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"CASE {whens} ELSE 7 END"


def x49_poisson_bootstrap(spark: SparkSession, sf: str) -> DataFrame:
    """Bootstrap CI for mean(o_totalprice) via the Poisson(1)
    approximation: resample b draws each row with weight ~ Poisson(1)
    (deterministic inverse-CDF on a per-(row, b) integer hash), so all
    B=32 resamples compute in ONE explode + ONE aggregation — no
    per-resample data pass, no multinomial coordination across
    partitions. This is the standard way to bootstrap a 100 TB table:
    weights are independent per row, the aggregate is map-side
    combinable, and B scales the explode factor, not the shuffle count.
    Output: full-sample mean, ~5th/95th percentile resample means (rank
    2 and 31 of 32)."""
    return poisson_bootstrap_frame(T(spark, sf, "orders"))


def poisson_bootstrap_frame(orders_raw: DataFrame) -> DataFrame:
    """Frame-level body of x49 over an orders frame."""
    orders = orders_raw.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice").cast("double") * 100.0)
        .cast("long")
        .alias("cents"),
    )
    rep = orders.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    ).withColumn(
        # Reduce o_orderkey mod 1000003 BEFORE the Knuth multiply:
        # ((a mod m) * k + c) mod m == (a*k + c) mod m, and the reduced
        # product tops out at ~2.65e15 — raw o_orderkey * 2654435761
        # would overflow int64 once orderkeys exceed ~3.5e9 (TPC-H
        # SF >~ 580): Spark wraps to a negative u (weight 0 rows) while
        # the DuckDB oracle errors. Spelled identically in _x49_sql().
        "u",
        (
            (
                (F.col("o_orderkey") % F.lit(1000003)) * F.lit(2654435761)
                + F.col("b") * F.lit(40503)
            )
            % F.lit(1000003)
        ).cast("double")
        / F.lit(1000003.0),
    )
    w = F.expr(_pois_case("u"))
    means = (
        rep.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum("w").alias("wsum"),
            F.sum(F.col("w") * F.col("cents")).alias("wcents"),
        )
        .select(
            "b",
            F.when(
                F.col("wsum") > 0,
                F.floor(
                    F.col("wcents").cast("double") * 100.0 / F.col("wsum")
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("mean_e4"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.asc("mean_e4"), F.asc("b"))),
        )
    )
    point = orders.agg(
        F.floor(
            F.sum("cents").cast("double") * 100.0 / F.count(F.lit(1))
        )
        .cast("long")
        .alias("point_mean_e4")
    )
    lo = means.filter(F.col("rn") == 2).select(
        F.col("mean_e4").alias("boot_lo_e4")
    )
    hi = means.filter(F.col("rn") == _B - 1).select(
        F.col("mean_e4").alias("boot_hi_e4")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.lit(_B).cast("long").alias("n_resamples"),
            "point_mean_e4",
            "boot_lo_e4",
            "boot_hi_e4",
        )
    )


def _x49_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey,
         floor(CAST(o_totalprice AS DOUBLE) * 100.0)::BIGINT AS cents
  FROM orders
),
rep AS (
  SELECT o_orderkey, cents, unnest(range(0, {_B})) AS b FROM o
),
u AS (
  SELECT b, cents,
         CAST(((o_orderkey % 1000003) * 2654435761 + b * 40503) % 1000003
              AS DOUBLE) / 1000003.0 AS u
  FROM rep
),
wtd AS (SELECT b, cents, {_pois_case("u")} AS w FROM u),
means AS (
  SELECT b,
         CASE WHEN sum(w) > 0
              THEN floor(CAST(sum(w * cents)::BIGINT AS DOUBLE) * 100.0
                         / sum(w)::BIGINT)::BIGINT
              ELSE 0 END AS mean_e4
  FROM wtd GROUP BY b
),
ranked AS (
  SELECT mean_e4,
         row_number() OVER (ORDER BY mean_e4 ASC, b ASC) AS rn
  FROM means
),
point AS (
  SELECT floor(CAST(sum(cents)::BIGINT AS DOUBLE) * 100.0
               / count(*))::BIGINT AS point_mean_e4
  FROM o
)
SELECT {_B}::BIGINT AS n_resamples,
       point.point_mean_e4,
       (SELECT mean_e4 FROM ranked WHERE rn = 2) AS boot_lo_e4,
       (SELECT mean_e4 FROM ranked WHERE rn = {_B - 1}) AS boot_hi_e4
FROM point"""


CATALOG_EXT31 = {
    "mm23_jpeg_color_roundtrip": (mm23_jpeg_color_roundtrip, _mm23_sql()),
    "td16_minhash_error_sweep": (td16_minhash_error_sweep, _td16_sql()),
    "tx41_rank_stability": (tx41_rank_stability, _tx41_sql()),
    "ts25_dim_covariance": (ts25_dim_covariance, _ts25_sql()),
    "x49_poisson_bootstrap": (x49_poisson_bootstrap, _x49_sql()),
}
