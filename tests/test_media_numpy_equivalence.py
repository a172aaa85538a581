"""Round-13 (guide §4.2): the numpy fast paths added inside the Arrow
tasks of the WAV/PNG operators must be EXACTLY equivalent to the
pure-stdlib loops they accelerate — the stdlib paths stay as the portable
fallback and reference, so any divergence is environment-dependent output
(the jpeg.py round-half lesson, ADVICE r12).

Each test runs the same kernel with numpy present and with the module's
``_np`` monkeypatched to None, on randomized inputs, and asserts
bit-identical results (bytes for codecs, values for stats).
"""

from __future__ import annotations

import random
import struct
import zlib

from bioeco_portal_etl_spark.multimodal import png as PNG
from bioeco_portal_etl_spark.multimodal import wavpcm as W


def _scalar(module, fn, *args):
    saved = module._np
    module._np = None
    try:
        return fn(*args)
    finally:
        module._np = saved


def test_wav_encode_decode_equivalence():
    assert W._np is not None
    rng = random.Random(7)
    for _ in range(20):
        n = rng.randrange(0, 2000)
        samples = [rng.randrange(-32768, 32768) for _ in range(n)]
        enc_np = W.encode_wav(samples)
        enc_sc = _scalar(W, W.encode_wav, samples)
        assert enc_np == enc_sc
        rate, s_list = W.decode_wav(enc_np)
        rate2, s_np = W.decode_wav_np(enc_np)
        assert rate == rate2 and s_np.tolist() == s_list


def test_wav_encode_range_check_matches_struct():
    import pytest

    with pytest.raises(ValueError):
        W.encode_wav([40000])
    with pytest.raises(Exception):  # struct.error on the stdlib path
        _scalar(W, W.encode_wav, [40000])


def test_png_filter0_fast_path_equivalence():
    assert PNG._np is not None
    rng = random.Random(11)
    for ch in (1, 3, 4):
        w, h = 5 + rng.randrange(9), 4 + rng.randrange(7)
        rows = [
            [rng.randrange(256) for _ in range(w * ch)] for _ in range(h)
        ]
        payload = PNG.encode_png(rows, channels=ch)
        got_np = PNG.decode_png(payload)
        got_sc = _scalar(PNG, PNG.decode_png, payload)
        assert got_np == got_sc == (w, h, ch, rows)


def test_png_nonzero_filters_still_loop_decode():
    """A hand-built PNG with Up-filtered scanlines must NOT take the
    filter-0 shortcut; numpy and scalar paths agree (both unfilter)."""
    w, h, ch = 4, 3, 1
    base = [[(x * 37 + y * 11) % 256 for x in range(w)] for y in range(h)]
    raw = bytearray()
    prev = [0] * w
    for r in base:
        raw.append(2)  # Up filter
        raw.extend((v - p) & 0xFF for v, p in zip(r, prev))
        prev = r
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + PNG._chunk(b"IHDR", ihdr)
        + PNG._chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + PNG._chunk(b"IEND", b"")
    )
    got_np = PNG.decode_png(payload)
    got_sc = _scalar(PNG, PNG.decode_png, payload)
    assert got_np == got_sc == (w, h, ch, base)


def test_resize_nearest_equivalence():
    rng = random.Random(13)
    for ch in (1, 3):
        w, h = 6 + rng.randrange(20), 5 + rng.randrange(15)
        rows = [
            [rng.randrange(256) for _ in range(w * ch)] for _ in range(h)
        ]
        for max_dim in (1, 3, 7, max(w, h) + 5):
            got_np = PNG.resize_nearest(w, h, ch, rows, max_dim)
            got_sc = _scalar(PNG, PNG.resize_nearest, w, h, ch, rows, max_dim)
            assert got_np == got_sc


def _collect_map_in_pandas(fn_df):
    return [tuple(r) for r in fn_df.orderBy(fn_df.columns[0]).collect()]


def test_media_operators_numpy_vs_scalar(spark):
    """End-to-end: synth -> stats/trim/downsample through mapInPandas,
    numpy on vs off (media._np monkeypatched inside the driver only —
    workers re-import, so instead compare against hand-computed scalar
    reference built from the SAME formulas here in the test)."""
    import pyspark.sql.functions as F

    from bioeco_portal_etl_spark.multimodal import media as M

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    wav = M.synth_pcm_wav(ids, "doc_id")
    stats = {r["media_id"]: r for r in M.wav_clip_stats(wav).collect()}
    bounds = {r["media_id"]: r for r in M.wav_trim_bounds(wav).collect()}
    ds = {
        r["media_id"]: r
        for r in M.wav_clip_stats(M.wav_downsample(wav)).collect()
    }
    for mid in range(40):
        n = M.SYNTH_N_BASE + mid % M.SYNTH_N_MOD
        s = [(mid * 13 + i * 7) % 2048 - 1024 for i in range(n)]
        r = stats[mid]
        assert r["n_samples"] == n
        assert r["energy"] == sum(v * v for v in s)
        assert r["min_s"] == min(s) and r["max_s"] == max(s)
        assert r["zero_cross"] == sum(
            1 for a, b in zip(s, s[1:]) if (a >= 0) != (b >= 0)
        )
        loud = [i for i, v in enumerate(s) if abs(v) >= 128]
        b = bounds[mid]
        assert (b["first_loud"], b["last_loud"]) == (loud[0], loud[-1])
        assert b["kept_energy"] == sum(
            v * v for v in s[loud[0] : loud[-1] + 1]
        )
        out = [
            sum(s[j * 4 : (j + 1) * 4]) // 4 for j in range(len(s) // 4)
        ]
        d = ds[mid]
        assert d["n_samples"] == len(out)
        assert d["energy"] == sum(v * v for v in out)
