"""Multimodal plumbing tests: binary payload columns through mapInPandas
stages — metadata decode, resize, frame sampling (fan-out), feature
extraction. Codecs are stubbed; schemas, batch shapes, fan-out, and
determinism are the real contracts under test."""

from __future__ import annotations

import pyspark.sql.functions as F

from bioeco_portal_etl_spark.multimodal.media import (
    attach_payload,
    decode_media_metadata,
    extract_features,
    resize_media,
    sample_frames,
)
from bioeco_portal_etl_spark.similarity.knn import cosine_topk
from bioeco_portal_etl_spark.sources.files import read_parquet_table
from tests.conftest import SF_SMOKE


def _payloads(spark, n=20):
    docs = read_parquet_table(spark, SF_SMOKE, "documents").limit(n)
    return attach_payload(docs, "doc_id", "text")


def test_payload_is_binary(spark):
    df = _payloads(spark)
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.orderBy("media_id").first()
    assert isinstance(row.payload, bytearray | bytes)


def test_resize_bounds_and_determinism(spark):
    out = resize_media(_payloads(spark), max_dim=64).orderBy("media_id")
    rows = out.collect()
    assert all(r.thumb_width <= 64 and r.thumb_height <= 64 for r in rows)
    assert all(len(r.thumb) <= 64 * 64 // 8 for r in rows)
    again = resize_media(_payloads(spark), max_dim=64).orderBy("media_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_frame_sampling_fan_out(spark):
    frames = sample_frames(_payloads(spark), every_n_bytes=64, max_frames=4)
    per_doc = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("last")
    )
    rows = per_doc.collect()
    assert all(1 <= r.n <= 4 and r.last == r.n - 1 for r in rows)
    f = frames.orderBy("media_id", "frame_idx").first()
    assert len(f.frame) <= 64


def test_features_feed_similarity_search(spark):
    """The stub featurizer's output is shaped like a real encoder's: plug it
    straight into the ANN operator (array<float> contract end-to-end)."""
    feats = extract_features(_payloads(spark), dim=16)
    assert dict(feats.dtypes)["feature"] == "array<float>"
    sums = feats.select(
        F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias("s")
    ).collect()
    assert all(abs(r.s - 1.0) < 1e-5 for r in sums)  # L1-normalized
    queries = feats.filter(F.col("media_id") < 3)
    topk = cosine_topk(feats, queries, "feature", "media_id", k=3)
    got = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_null_text_payloads_do_not_crash(spark):
    """Null text -> empty payload through every stage (the oracle side
    coalesces identically)."""
    docs = spark.createDataFrame(
        [(1, "some text"), (2, None)], "doc_id long, text string"
    )
    payloads = attach_payload(docs, "doc_id", "text")
    meta = {r.media_id: r.n_bytes for r in decode_media_metadata(payloads).collect()}
    assert meta == {1: 9, 2: 0}
    assert resize_media(payloads).count() == 2
    assert extract_features(payloads).count() == 2
    frames = sample_frames(payloads)
    assert frames.filter(F.col("media_id") == 2).count() == 1  # min 1 frame


def _bmp_bytes(width, height, top_down=False):
    """A genuine minimal BMP file: 14-byte file header + 40-byte
    BITMAPINFOHEADER + 24bpp pixel rows padded to 4 bytes."""
    import struct

    row = (width * 3 + 3) // 4 * 4
    pixels = bytes(row * height)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if top_down else height, 1, 24, 0,
        len(pixels), 2835, 2835, 0, 0,
    )
    return hdr + info + pixels


def test_real_codec_through_decode_seam(spark):
    """The decode_fn seam carries a REAL codec (pure-stdlib BMP header
    parse) over genuine image bytes through the Arrow mapInPandas path —
    the same stage the stub runs on, proving the plumbing isn't
    stub-shaped (round-3 ADVICE)."""
    from bioeco_portal_etl_spark.multimodal.media import parse_bmp_header

    blobs = [
        (1, _bmp_bytes(17, 5)),
        (2, _bmp_bytes(640, 480)),
        (3, _bmp_bytes(2, 9, top_down=True)),  # negative height in header
    ]
    df = spark.createDataFrame(blobs, "media_id long, payload binary").repartition(2)
    out = {
        r.media_id: (r.width, r.height, r.media_format, r.n_bytes)
        for r in decode_media_metadata(df, decode_fn=parse_bmp_header).collect()
    }
    assert out[1] == (17, 5, "bmp", len(blobs[0][1]))
    assert out[2] == (640, 480, "bmp", len(blobs[1][1]))
    assert out[3] == (2, 9, "bmp", len(blobs[2][1]))
    # header sanity: the blobs really are BMP (independent re-parse)
    assert parse_bmp_header(blobs[1][1]) == (640, 480, "bmp")


def test_scene_cuts_flags_intensity_jump(spark):
    from bioeco_portal_etl_spark.multimodal.media import scene_cuts

    # frame 0: 4 bytes of 'A'(65); frame 1: 4 bytes of 'z'(122) -> jump
    df = spark.createDataFrame(
        [(1, bytearray(b"AAAAzzzzAAAA"))], "media_id long, payload binary"
    )
    out = scene_cuts(df, frame_bytes=4, threshold=8, max_frames=8).collect()
    rows = {r["frame_idx"]: r.asDict() for r in out}
    assert rows[0]["mean_u8"] == 65 and rows[0]["is_cut"] is False
    assert rows[1]["mean_u8"] == 122 and rows[1]["is_cut"] is True
    assert rows[2]["mean_u8"] == 65 and rows[2]["is_cut"] is True


def test_mmr_prefers_diverse_over_redundant(spark):
    from bioeco_portal_etl_spark.similarity.rerank import mmr_rerank

    # candidates: two near-identical highly relevant vecs + one diverse
    # moderately relevant vec. MMR rank 2 must pick the diverse one.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (10, [0.99, 0.14, 0.0, 0.0]),     # top relevance
        (11, [0.99, 0.141, 0.0, 0.0]),    # near-copy of 10
        (12, [0.7, -0.7, 0.1, 0.0]),      # diverse, lower relevance
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    out = {
        r["sel_rank"]: r["match_id"]
        for r in mmr_rerank(
            df, q, "embedding", "vec_id", k_shortlist=10, k_select=3
        ).collect()
    }
    assert out[1] == 10          # pure relevance first
    assert out[2] == 12          # diversity beats the near-copy
    assert out[3] == 11
