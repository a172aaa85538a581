"""Round-5 catalog extensions, fifth batch — 6 entries:

- tx23_heavy_hitters: certified exact top-k tokens (operators/
  heavyhitters.py) — per-partition Misra–Gries-style candidates + exact
  recount + a machine-checked completeness certificate; the oracle is
  the plain full groupBy the two-phase plan provably equals;
- tx24_bpe_encode: APPLY the 2 trained BPE merges (text/bpe.py — the
  tx21 training loop's output) to the corpus and report per-document
  word/subtoken counts — training and inference of the same tokenizer;
- x26_bloom_join: Bloom-pruned fact⋈dim join (operators/bloomjoin.py) —
  runtime-filter pruning in the scan stage, result identical to the
  plain join the oracle computes;
- dq8_lateness_audit: watermark lateness accounting (operators/
  lateness.py) — ontime/late/dropped counts under the exact
  withWatermark policy, the measurement face of the w1-w12 streaming
  entries;
- rel26_pivot: wide pivot (groupBy().pivot() with pinned value list) of
  order counts by year x priority — the reshaping twin of r2's unpivot;
- mm9_wav_downsample: audio decimation via block means through TWO real
  WAV codec round-trips (multimodal/media.py wav_downsample →
  wav_clip_stats) — the payload crosses two Arrow stage boundaries and
  every output number is recomputed by the oracle from the sample
  formula.

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
# tx23 — certified exact heavy hitters
# ---------------------------------------------------------------------------


def tx23_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-10 tokens of the documents corpus via the two-phase
    certified heavy-hitter plan; the result is provably the full
    groupBy's answer, which is what the oracle runs."""
    from bioeco_portal_etl_spark.operators.heavyhitters import (
        certified_heavy_hitters,
    )
    from bioeco_portal_etl_spark.text.tokenize import tokens

    docs = T(spark, sf, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("tok"))
    return certified_heavy_hitters(tok, "tok", k=10).orderBy("rank")


TX23_SQL = """
WITH tok AS (
  SELECT t AS key FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                          x -> x <> '')) AS u(t)
),
cnts AS (SELECT key, count(*)::BIGINT AS cnt FROM tok GROUP BY key)
SELECT key, cnt, rank FROM (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key)::BIGINT AS rank
  FROM cnts)
WHERE rank <= 10 ORDER BY rank"""


# ---------------------------------------------------------------------------
# tx24 — BPE encode with the trained merges
# ---------------------------------------------------------------------------


def tx24_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Train 2 BPE merges on the corpus (the tx21 loop), then ENCODE:
    every word rewritten through both merges, per-document word and
    subtoken counts for the first 200 docs. The vocabulary table is
    Heaps-bounded, so the encode join is a broadcast against corpus-scale
    tokens — the standard tokenizer-inference layout."""
    from bioeco_portal_etl_spark.text.bpe import (
        apply_merge,
        pair_counts,
        top_merge,
        with_spaced,
        word_frequencies,
    )

    docs = T(spark, sf, "documents")
    wf = with_spaced(word_frequencies(docs, "text"))
    m1 = apply_merge(wf, top_merge(pair_counts(wf))).select(
        "w", "cnt", "spaced"
    )
    m2 = apply_merge(m1, top_merge(pair_counts(m1))).select("w", "spaced")
    vocab = m2.select(
        "w", F.size(F.split("spaced", " ")).cast("long").alias("n_sub")
    )
    tok = (
        docs.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    return (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subtokens"),
        )
        .orderBy("doc_id")
    )


TX24_SQL = r"""
WITH wf AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE w <> '' GROUP BY w
),
sp AS (
  SELECT w, cnt, trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS spaced
  FROM wf
),
p1 AS (
  SELECT pair, sum(cnt)::BIGINT AS cnt
  FROM sp, unnest(list_transform(range(1, len(string_split(spaced, ' '))),
         i -> string_split(spaced, ' ')[i] || ' ' ||
              string_split(spaced, ' ')[i + 1])) AS u(pair)
  GROUP BY pair
),
best1 AS (
  SELECT string_split(pair, ' ')[1] AS ml, string_split(pair, ' ')[2] AS mr
  FROM p1 ORDER BY cnt DESC, pair LIMIT 1
),
m1 AS (
  SELECT w, cnt,
         list_reduce(string_split(spaced, ' '),
           (acc, x) -> CASE WHEN x = mr AND (acc = ml OR
                                             ends_with(acc, ' ' || ml))
                       THEN acc[1:length(acc) - length(ml)] || ml || mr
                       ELSE acc || ' ' || x END) AS spaced
  FROM sp, best1
),
p2 AS (
  SELECT pair, sum(cnt)::BIGINT AS cnt
  FROM m1, unnest(list_transform(range(1, len(string_split(spaced, ' '))),
         i -> string_split(spaced, ' ')[i] || ' ' ||
              string_split(spaced, ' ')[i + 1])) AS u(pair)
  GROUP BY pair
),
best2 AS (
  SELECT string_split(pair, ' ')[1] AS ml, string_split(pair, ' ')[2] AS mr
  FROM p2 ORDER BY cnt DESC, pair LIMIT 1
),
m2 AS (
  SELECT w,
         list_reduce(string_split(spaced, ' '),
           (acc, x) -> CASE WHEN x = mr AND (acc = ml OR
                                             ends_with(acc, ' ' || ml))
                       THEN acc[1:length(acc) - length(ml)] || ml || mr
                       ELSE acc || ' ' || x END) AS spaced
  FROM m1, best2
),
vocab AS (
  SELECT w, len(string_split(spaced, ' '))::BIGINT AS n_sub FROM m2
),
tok AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents WHERE doc_id < 200)
  WHERE w <> ''
)
SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_sub)::BIGINT AS n_subtokens
FROM tok JOIN vocab USING (w)
GROUP BY doc_id ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# x26 — Bloom-pruned join
# ---------------------------------------------------------------------------


def x26_bloom_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefiltered lineitem⋈supplier join against the nation<5
    supplier slice: non-joining fact rows die in the scan stage (literal
    bitset probe, no exchange), false positives die in the join — the
    per-nation rollup must equal the plain join's, which the oracle
    computes."""
    from bioeco_portal_etl_spark.operators.bloomjoin import (
        bloom_filtered_join,
    )

    li = T(spark, sf, "lineitem").select("l_suppkey", "l_quantity")
    dim = (
        T(spark, sf, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey", "s_nationkey")
    )
    joined = bloom_filtered_join(li, dim, "l_suppkey", "s_suppkey")
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("s_nationkey")
    )


X26_SQL = """
SELECT s_nationkey, count(*)::BIGINT AS n_items,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey < 5
GROUP BY s_nationkey
ORDER BY s_nationkey"""


# ---------------------------------------------------------------------------
# dq8 — watermark lateness accounting
# ---------------------------------------------------------------------------

_DQ8_DELAY = 300


def dq8_lateness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """ontime/late/dropped counts per event type under a {d}-second
    watermark (operators/lateness.py): arrival order = event_id, high-
    water mark = per-user running max event time of PRIOR arrivals — the
    measurement that picks a streaming delay before deploying it."""
    from bioeco_portal_etl_spark.operators.lateness import lateness_audit

    ev = T(spark, sf, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    return lateness_audit(
        ev, "user_id", "event_id", "ts", _DQ8_DELAY, group_col="event_type"
    ).orderBy("grp", "status")


dq8_lateness_audit.__doc__ = dq8_lateness_audit.__doc__.format(d=_DQ8_DELAY)


def _dq8_sql() -> str:
    from bioeco_portal_etl_spark.operators.lateness import duck_lateness_cte

    ctes = duck_lateness_cte(
        "events", "user_id", "event_id", "ts", _DQ8_DELAY, "event_type"
    )
    return f"""
WITH {ctes.lstrip()}
SELECT grp, status, n FROM lat ORDER BY grp, status"""


# ---------------------------------------------------------------------------
# rel26 — wide pivot (the reshaping twin of r2's unpivot)
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_notspec", "p5_low"]


def rel26_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Order counts pivoted to one column per priority, one row per order
    year — ``groupBy().pivot(values=...)`` with the value list PINNED
    (no extra distinct-discovery job, deterministic column order: the
    production spelling for a bounded pivot dimension)."""
    o = T(spark, sf, "orders")
    piv = (
        o.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "o_year",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in zip(_PRIORITIES, _PIV_ALIASES)
        ],
    )
    return renamed.orderBy("o_year")


REL26_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT
         AS p1_urgent,
       sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT
         AS p2_high,
       sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT
         AS p3_medium,
       sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0
           END)::BIGINT AS p4_notspec,
       sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT
         AS p5_low
FROM orders GROUP BY 1 ORDER BY o_year"""


# ---------------------------------------------------------------------------
# mm9 — audio decimation through two codec round-trips
# ---------------------------------------------------------------------------

_MM9_FACTOR = 4


def mm9_wav_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """Decimate every synthetic clip by {f}x (block means through the
    REAL WAV codec, multimodal/media.py wav_downsample) and re-run the
    clip-stats stage on the resampled container — the payload survives
    synth -> downsample -> stats across two Arrow boundaries, and the
    oracle recomputes every number from the sample formula."""
    from bioeco_portal_etl_spark.multimodal.media import (
        synth_pcm_wav,
        wav_clip_stats,
        wav_downsample,
    )

    ids = (
        T(spark, sf, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )
    return wav_clip_stats(
        wav_downsample(synth_pcm_wav(ids, "doc_id"), factor=_MM9_FACTOR)
    ).orderBy("media_id")


mm9_wav_downsample.__doc__ = mm9_wav_downsample.__doc__.format(f=_MM9_FACTOR)


def _mm9_sql() -> str:
    from bioeco_portal_etl_spark.multimodal.media import (
        SYNTH_N_BASE,
        SYNTH_N_MOD,
    )

    f = _MM9_FACTOR
    return f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 500),
idx AS (
  SELECT doc_id,
         unnest(range(0, ({SYNTH_N_BASE} + doc_id % {SYNTH_N_MOD}) // {f}))
           AS j
  FROM ids
),
blk AS (
  SELECT doc_id, j,
         CAST(floor(CAST(list_reduce(list_transform(range(0, {f}),
                t -> (doc_id * 13 + (j * {f} + t) * 7) % 2048 - 1024),
              (a, b) -> a + b) AS DOUBLE) / {f}) AS BIGINT) AS s
  FROM idx
),
lagd AS (
  SELECT doc_id, s,
         lag(s) OVER (PARTITION BY doc_id ORDER BY j) AS p
  FROM blk
)
SELECT doc_id AS media_id,
       count(*)::BIGINT AS n_samples,
       sum(s * s)::BIGINT AS energy,
       min(s)::BIGINT AS min_s,
       max(s)::BIGINT AS max_s,
       sum(CASE WHEN p IS NOT NULL AND ((s >= 0) <> (p >= 0))
                THEN 1 ELSE 0 END)::BIGINT AS zero_cross
FROM lagd
GROUP BY doc_id
ORDER BY media_id"""


CATALOG_EXT8 = {
    "tx23_heavy_hitters": (tx23_heavy_hitters, TX23_SQL),
    "tx24_bpe_encode": (tx24_bpe_encode, TX24_SQL),
    "x26_bloom_join": (x26_bloom_join, X26_SQL),
    "dq8_lateness_audit": (dq8_lateness_audit, _dq8_sql()),
    "rel26_pivot": (rel26_pivot, REL26_SQL),
    "mm9_wav_downsample": (mm9_wav_downsample, _mm9_sql()),
}
