"""Round-6 catalog extensions, eighth batch — 5 entries:

- mm20_shot_lengths: shot-length distribution per clip from the mm5
  scene-cut flags (cumulative-cut segmentation + rollup) — the pacing
  statistic video-curation filters on;
- sk13_histq_error_sweep: mergeable-histogram quantile estimates vs the
  exact nearest-rank answer at bin widths {8, 16, 64} — the
  bins-vs-accuracy law certified (the sk10/sk12 convention);
- ts23_pq_utilization: per-subspace PQ codebook utilization (codes
  used, hottest code, Gini balance) — dead/hot codes mean the codebook
  needs retraining, the PQ face of ts15's IVF balance;
- x47_decile_lift: the model-evaluation lift/cumulative-gains table
  over price deciles (ntile under a total order) — the classic ranked-
  targeting readout;
- rel36_cycle_time: order-to-ship cycle-day percentiles per month via
  frequency-table rank selection — the ops-latency reporting shape.

Same contract as catalog.py: identical aliases both sides,
deterministic ORDER BY, BIGINT-cast integer surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bioeco_portal_etl_spark.sources.files import read_parquet_table as T

# ---------------------------------------------------------------------------
# mm20 — shot lengths from scene cuts
# ---------------------------------------------------------------------------


def mm20_shot_lengths(spark: SparkSession, sf: str) -> DataFrame:
    """(media_id, n_frames, n_shots, max_shot_len, mean_len_e2): shots
    are maximal runs between cut flags (mm5's Arrow stage), segmented
    with ONE cumulative-sum window per clip and rolled up."""
    from bioeco_portal_etl_spark.multimodal.media import (
        attach_payload,
        scene_cuts,
    )

    d = T(spark, sf, "documents")
    cuts = scene_cuts(
        attach_payload(d, "doc_id", "text"),
        frame_bytes=64,
        threshold=8,
        max_frames=8,
    )
    w = (
        Window.partitionBy("media_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shots = cuts.withColumn(
        "shot_id", F.sum(F.col("is_cut").cast("long")).over(w)
    )
    per_shot = shots.groupBy("media_id", "shot_id").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        per_shot.groupBy("media_id")
        .agg(
            F.sum("len").cast("long").alias("n_frames"),
            F.count(F.lit(1)).cast("long").alias("n_shots"),
            F.max("len").cast("long").alias("max_shot_len"),
            F.expr(
                "CAST((100 * sum(len)) div count(1) AS BIGINT)"
            ).alias("mean_len_e2"),
        )
        .orderBy("media_id")
    )


_MM20_SQL = """
WITH f AS (
  SELECT doc_id AS media_id,
         unnest(range(0, least(8, (length(text) + 63) // 64))) AS frame_idx,
         text
  FROM documents
),
m AS (
  SELECT media_id, frame_idx,
         (list_sum(list_transform(
            range(1, length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) + 1),
            j -> unicode(substr(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64), CAST(j AS INT), 1))
          )) // length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)))::BIGINT
           AS mean_u8
  FROM f
),
lagged AS (
  SELECT media_id, frame_idx, mean_u8,
         lag(mean_u8) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev
  FROM m
),
cuts AS (
  SELECT media_id, frame_idx,
         coalesce(abs(mean_u8 - prev) > 8, FALSE) AS is_cut
  FROM lagged
),
shots AS (
  SELECT media_id,
         sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
           OVER (PARTITION BY media_id ORDER BY frame_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS shot_id
  FROM cuts
),
per_shot AS (
  SELECT media_id, shot_id, count(*)::BIGINT AS len
  FROM shots GROUP BY media_id, shot_id
)
SELECT media_id, sum(len)::BIGINT AS n_frames,
       count(*)::BIGINT AS n_shots,
       max(len)::BIGINT AS max_shot_len,
       CAST((100 * sum(len)) // count(*) AS BIGINT) AS mean_len_e2
FROM per_shot GROUP BY media_id ORDER BY media_id"""


# ---------------------------------------------------------------------------
# sk13 — histogram-quantile error sweep
# ---------------------------------------------------------------------------


def sk13_histq_error_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """(bins, n, p50_est_cents, p50_true_cents, err_cents): the
    mergeable fixed-bin histogram's p50 vs the exact nearest-rank p50
    of o_totalprice, at 8/16/64 bins over [0, 51200) dollars — wider
    bins, coarser answers, by a measured amount."""
    from bioeco_portal_etl_spark.sketches.histq import (
        binned_histogram,
        exact_quantiles_cents,
        hist_quantiles,
    )

    o = T(spark, sf, "orders")
    exact = exact_quantiles_cents(
        o, [], "o_totalprice", [("p50", 2, 1)]
    ).select(F.col("p50_exact_cents").alias("p50_true_cents"))
    out = None
    for bins in (8, 16, 64):
        step = 5_120_000 // bins  # cents over [0, 51200$)
        h = binned_histogram(
            o, [], "o_totalprice", bins=bins, lo_cents=0, step_cents=step
        )
        est = hist_quantiles(
            h, [], [("p50", 2, 1)], lo_cents=0, step_cents=step
        ).select(
            F.lit(bins).cast("long").alias("bins"),
            F.col("n").cast("long").alias("n"),
            F.col("p50_est_cents").cast("long").alias("p50_est_cents"),
        )
        row = est.crossJoin(F.broadcast(exact)).select(
            "bins",
            "n",
            "p50_est_cents",
            F.col("p50_true_cents").cast("long").alias("p50_true_cents"),
            (F.col("p50_est_cents") - F.col("p50_true_cents"))
            .cast("long")
            .alias("err_cents"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bins")


def _sk13_sql() -> str:
    arms = []
    for bins in (8, 16, 64):
        step = 5_120_000 // bins
        arms.append(f"""
SELECT {bins} AS bins, max(n)::BIGINT AS n,
       (min(CASE WHEN 2 * cum >= n THEN bin END) * {step})::BIGINT
         AS p50_est_cents
FROM (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER () AS n
  FROM (
    SELECT least(greatest(CAST(floor((CAST(floor(o_totalprice * 100)
             AS BIGINT) - 0) / {step}) AS BIGINT), 0), {bins - 1}) AS bin,
           count(*)::BIGINT AS cnt
    FROM orders GROUP BY 1))""")
    u = " UNION ALL ".join(f"({a})" for a in arms)
    return f"""
WITH exact AS (
  SELECT min(CASE WHEN 2 * cumr >= n THEN v END)::BIGINT AS p50_true_cents
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cumr,
           sum(c) OVER () AS n
    FROM (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
                 count(*)::BIGINT AS c
          FROM orders GROUP BY 1))
),
arms AS ({u})
SELECT a.bins, a.n, a.p50_est_cents, e.p50_true_cents,
       (a.p50_est_cents - e.p50_true_cents)::BIGINT AS err_cents
FROM arms a CROSS JOIN exact e ORDER BY a.bins"""


# ---------------------------------------------------------------------------
# ts23 — PQ codebook utilization
# ---------------------------------------------------------------------------


def ts23_pq_utilization(spark: SparkSession, sf: str) -> DataFrame:
    """(subspace, n_vectors, n_codes_used, max_count, gini_e6): how
    evenly the corpus spreads over each subspace's 16 codes (the ts5
    codebook fixture). A dead code wastes codebook capacity; a hot code
    collapses distances — both retraining signals."""
    from bioeco_portal_etl_spark.similarity.pq import pq_encode

    e = T(spark, sf, "embeddings")
    v = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    cb = v.filter(F.col("vec_id") < 128).select(
        F.expr("vec_id div 16").cast("int").alias("subspace"),
        (F.col("vec_id") % 16).cast("int").alias("code"),
        F.expr("slice(e, (vec_id div 16) * 8 + 1, 8)").alias("subvec"),
    )
    enc = pq_encode(v, cb, "e", "vec_id")
    per_code = enc.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_code.groupBy("subspace")
        .agg(
            F.sum("cnt").cast("long").alias("n_vectors"),
            F.count(F.lit(1)).cast("long").alias("n_codes_used"),
            F.max("cnt").cast("long").alias("max_count"),
            F.expr(
                "CAST(1000000 - (1000000 * sum(cnt * cnt))"
                " div (sum(cnt) * sum(cnt)) AS BIGINT)"
            ).alias("gini_e6"),
        )
        .select(
            F.col("subspace").cast("long").alias("subspace"),
            "n_vectors",
            "n_codes_used",
            "max_count",
            "gini_e6",
        )
        .orderBy("subspace")
    )


def _ts23_sql() -> str:
    return """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
),
cb AS (
  SELECT (vec_id // 16)::INT AS subspace, (vec_id % 16)::INT AS code,
         list_slice(e, (vec_id // 16) * 8 + 1, (vec_id // 16) * 8 + 8) AS cvec
  FROM v WHERE vec_id < 128
),
sub AS (
  SELECT vec_id, s.s::INT AS subspace,
         list_slice(e, s.s * 8 + 1, s.s * 8 + 8) AS subvec
  FROM v, (SELECT unnest(range(0, 8)) AS s) s
),
enc AS (
  SELECT vec_id, subspace, code FROM (
    SELECT a.vec_id, a.subspace, cb.code,
           row_number() OVER (PARTITION BY a.vec_id, a.subspace
                              ORDER BY list_reduce(list_transform(range(1, 9), i -> (a.subvec[i] - cb.cvec[i]) * (a.subvec[i] - cb.cvec[i])), (x, y) -> x + y) ASC, cb.code ASC) AS rn
    FROM sub a JOIN cb USING (subspace))
  WHERE rn = 1
),
per_code AS (
  SELECT subspace, code, count(*)::BIGINT AS cnt
  FROM enc GROUP BY subspace, code
)
SELECT subspace::BIGINT AS subspace,
       sum(cnt)::BIGINT AS n_vectors,
       count(*)::BIGINT AS n_codes_used,
       max(cnt)::BIGINT AS max_count,
       CAST(1000000 - (1000000 * sum(cnt * cnt))
            // (sum(cnt) * sum(cnt)) AS BIGINT) AS gini_e6
FROM per_code GROUP BY subspace ORDER BY subspace"""


# ---------------------------------------------------------------------------
# x47 — decile lift table
# ---------------------------------------------------------------------------


def x47_decile_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Lift/gains over price deciles: rank orders by (o_totalprice
    DESC, o_orderkey) into 10 equal buckets, outcome = status 'F';
    (decile, n, positives, pos_rate_e6, lift_e6, cum_gain_e6) — the
    ranked-targeting evaluation every scoring model gets.

    Scale posture: exact ntile is a GLOBAL sort (single window
    partition — probe shows the expected linear 6.6× at 10×). That is
    the right tool for its actual input — a SCORED CANDIDATE set, which
    is bounded by the scoring budget, not the corpus; for corpus-scale
    decile assignment use x20's equi-depth boundaries (frequency-table
    rank selection, no global window) and accept boundary-tie skew."""
    o = T(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderstatus") == "F").cast("long").alias("pos"),
    )
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    d = o.withColumn("decile", F.ntile(10).over(w))
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("positives")
    )
    wt = Window.partitionBy()
    wc = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per.withColumn("total_n", F.sum("n").over(wt))
        .withColumn("total_pos", F.sum("positives").over(wt))
        .withColumn("cum_pos", F.sum("positives").over(wc))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.col("positives").cast("long").alias("positives"),
            F.expr("CAST((1000000 * positives) div n AS BIGINT)").alias(
                "pos_rate_e6"
            ),
            F.expr(
                "CASE WHEN total_pos > 0 THEN CAST((1000000 * positives"
                " * total_n) div (n * total_pos) AS BIGINT) END"
            ).alias("lift_e6"),
            F.expr(
                "CASE WHEN total_pos > 0 THEN"
                " CAST((1000000 * cum_pos) div total_pos AS BIGINT) END"
            ).alias("cum_gain_e6"),
        )
        .orderBy("decile")
    )


def _x47_sql() -> str:
    return """
WITH ranked AS (
  SELECT (o_orderstatus = 'F')::BIGINT AS pos,
         ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
  FROM orders
),
per AS (
  SELECT decile, count(*)::BIGINT AS n, sum(pos)::BIGINT AS positives
  FROM ranked GROUP BY decile
)
SELECT decile::BIGINT AS decile, n, positives,
       CAST((1000000 * positives) // n AS BIGINT) AS pos_rate_e6,
       CASE WHEN sum(positives) OVER () > 0 THEN
         CAST((1000000 * positives * sum(n) OVER ())
              // (n * sum(positives) OVER ()) AS BIGINT) END AS lift_e6,
       CASE WHEN sum(positives) OVER () > 0 THEN
         CAST((1000000 * sum(positives)
                         OVER (ORDER BY decile
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW))
              // sum(positives) OVER () AS BIGINT) END AS cum_gain_e6
FROM per ORDER BY decile"""


# ---------------------------------------------------------------------------
# rel36 — order-to-ship cycle time percentiles
# ---------------------------------------------------------------------------


def rel36_cycle_time(spark: SparkSession, sf: str) -> DataFrame:
    """(month, n, min_days, p50_days, max_days): ship-lag percentiles
    per order month via frequency-table rank selection (the exact
    nearest-rank convention — no data-sized sort, the per-(month, days)
    table is what the window sees)."""
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = T(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias(
            "month"
        ),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("days"),
    )
    vt = j.groupBy("month", "days").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("month")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wm = Window.partitionBy("month")
    cum = vt.select(
        "month",
        "days",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wm).alias("n"),
    )
    return (
        cum.groupBy("month")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.min("days").cast("long").alias("min_days"),
            F.min(
                F.when(F.lit(2) * F.col("cum") >= F.col("n"), F.col("days"))
            )
            .cast("long")
            .alias("p50_days"),
            F.max("days").cast("long").alias("max_days"),
        )
        .orderBy("month")
    )


def _rel36_sql() -> str:
    return """
WITH j AS (
  SELECT time_bucket(INTERVAL '1 month', CAST(o_orderdate AS TIMESTAMP))
           AS month,
         datediff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE))::BIGINT AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
vt AS (SELECT month, days, count(*)::BIGINT AS c FROM j GROUP BY month, days),
cum AS (
  SELECT month, days,
         sum(c) OVER (PARTITION BY month ORDER BY days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY month) AS n
  FROM vt
)
SELECT month, max(n)::BIGINT AS n,
       min(days)::BIGINT AS min_days,
       min(CASE WHEN 2 * cum >= n THEN days END)::BIGINT AS p50_days,
       max(days)::BIGINT AS max_days
FROM cum GROUP BY month ORDER BY month"""


CATALOG_EXT28 = {
    "mm20_shot_lengths": (mm20_shot_lengths, _MM20_SQL),
    "sk13_histq_error_sweep": (sk13_histq_error_sweep, _sk13_sql()),
    "ts23_pq_utilization": (ts23_pq_utilization, _ts23_sql()),
    "x47_decile_lift": (x47_decile_lift, _x47_sql()),
    "rel36_cycle_time": (rel36_cycle_time, _rel36_sql()),
}
