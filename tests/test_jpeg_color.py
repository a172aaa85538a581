"""Baseline 4:4:4 YCbCr color JPEG codec tests (multimodal/jpeg.py,
round 7 — VERDICT r6 #6).

Discipline carried over from the grayscale tests (tests/test_jpeg.py):
the compensating-bug loop of testing a codec against its own inverse is
broken by HAND-PINNED bitstreams — scan bytes derived from the T.81
code tables by hand and asserted literally against the encoder, and the
decoder driven with a hand-assembled file containing a bit pattern the
encoder never produced (cross-MCU chroma DPCM with zero diffs).
"""

from __future__ import annotations

import struct

import pytest

from bioeco_portal_etl_spark.multimodal.jpeg import (
    AC_BITS,
    AC_BITS_C,
    AC_VALS,
    AC_VALS_C,
    DC_BITS,
    DC_BITS_C,
    DC_VALS,
    DC_VALS_C,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
    is_jpeg,
)


def _scan_bytes(payload: bytes) -> bytes:
    """Entropy-coded scan data between the SOS header and EOI."""
    pos = 2
    while True:
        marker = payload[pos + 1]
        pos += 2
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xDA:
            return payload[pos + seg_len : -2]
        pos += seg_len


# ---------------------------------------------------------------------------
# hand-pinned encoder bitstream
# ---------------------------------------------------------------------------


def test_color_scan_bytes_hand_pinned():
    """8x8 constant RGB (90, 130, 200). Pinned conversion gives
    YCbCr = (126, 170, 102) (y0 = 126.02, cb0 = 169.749, cr0 = 102.307,
    each floor(v+0.5)), so the all-ones-quant DC coefficients are
    8*(v-128) = -16 / +336 / -208 and every AC is 0.

    Hand-coded scan (T.81 Annex K canonical codes, derived by hand):
      Y  (luma tables):   DC diff -16: cat 5 -> '110', amp 15 -> '01111';
                          EOB -> '1010'
      Cb (chroma tables): DC diff 336: cat 9 -> '111111110',
                          amp 336 -> '101010000'; EOB -> '00'
      Cr (chroma tables): DC diff -208: cat 8 -> '11111110',
                          amp -208+255=47 -> '00101111'; EOB -> '00'
    50 bits, padded with six 1-bits:
      11001111 10101111 11110101 01000000 11111110 00101111 00111111
    """
    rows = [[v for _ in range(8) for v in (90, 130, 200)] for _ in range(8)]
    assert _scan_bytes(encode_jpeg_color(rows)) == bytes.fromhex(
        "cfaff540fe2f3f"
    )


# ---------------------------------------------------------------------------
# hand-assembled decoder input (a stream the encoder never produced)
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def test_decode_hand_assembled_two_mcu_color():
    """16x8 4:4:4 file assembled by hand: MCU 1 carries the (90,130,200)
    blocks above; MCU 2 raises Y to 130 (DC diff +32: luma cat 6 ->
    '1110', amp '100000') with ZERO chroma diffs (chroma DC cat 0 ->
    '00', no amp) — a cross-MCU DPCM pattern with explicit zero-diff
    chroma codes. 72 bits exactly, no padding:
      MCU1: 110 01111 1010 | 111111110 101010000 00 | 11111110 00101111 00
      MCU2: 1110 100000 1010 | 00 00 | 00 00
    -> CF AF F5 40 FE 2F 3A 0A 00
    Expected pixels (independent arithmetic, _ycbcr_to_rgb pinned form):
      tile 1: ycc(126,170,102) -> ( 90, 130, 200)
      tile 2: ycc(130,170,102) -> ( 94, 134, 204)
    """
    f = bytearray(b"\xff\xd8")
    f += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    f += _seg(0xFFDB, b"\x00" + bytes([1] * 64) + b"\x01" + bytes([1] * 64))
    f += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 8, 16, 3)
        + b"\x01\x11\x00"
        + b"\x02\x11\x01"
        + b"\x03\x11\x01",
    )
    f += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    f += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    f += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    f += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    f += _seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    f += bytes.fromhex("cfaff540fe2f3a0a00")
    f += b"\xff\xd9"

    w, h, c, rows = decode_jpeg(bytes(f))
    assert (w, h, c) == (16, 8, 3)
    for y in range(8):
        for x in range(16):
            px = tuple(rows[y][3 * x : 3 * x + 3])
            assert px == ((90, 130, 200) if x < 8 else (94, 134, 204)), (
                x,
                y,
                px,
            )


# ---------------------------------------------------------------------------
# round-trip exactness on block-constant rasters
# ---------------------------------------------------------------------------


def _tile_px(seed: int, x: int, y: int, c: int) -> int:
    return (seed * 31 + (x // 8) * 7 + (y // 8) * 11 + c * 17) % 256


@pytest.mark.parametrize("seed,w,h", [(0, 8, 8), (3, 19, 17), (7, 24, 9), (11, 21, 20)])
def test_color_roundtrip_equals_double_conversion(seed, w, h):
    """decode(encode(px)) == ycbcr_to_rgb(rgb_to_ycbcr(px)) exactly for
    tile-constant RGB under all-ones quantization — three interleaved
    Huffman/DPCM/IDCT pipelines collapse to the pinned double conversion
    (the mm23 oracle's arithmetic). Non-multiple-of-8 dims exercise edge
    replication + crop."""
    rows = [
        [_tile_px(seed, x, y, c) for x in range(w) for c in range(3)]
        for y in range(h)
    ]
    gw, gh, gc, got = decode_jpeg(encode_jpeg_color(rows))
    assert (gw, gh, gc) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            exp = _ycbcr_to_rgb(
                *_rgb_to_ycbcr(*(_tile_px(seed, x, y, c) for c in range(3)))
            )
            assert tuple(got[y][3 * x : 3 * x + 3]) == exp


def test_general_content_roundtrip_bounded():
    """Arbitrary (non-tile-constant) content is LOSSY but bounded: with
    all-ones quantization each coefficient rounds by <= 0.5, so pixel
    error stays small; this pins the bound on a fixed pseudo-random
    image so a quantizer regression (wrong table, wrong rounding) fails
    loudly."""
    rows = [
        [(13 * y + 7 * i + (i * i) % 31) % 256 for i in range(3 * 13)]
        for y in range(10)
    ]
    w, h, c, got = decode_jpeg(encode_jpeg_color(rows))
    assert (w, h, c) == (13, 10, 3)
    worst = max(
        abs(got[y][i] - rows[y][i]) for y in range(10) for i in range(3 * 13)
    )
    assert worst <= 4


def test_ycbcr_conversion_pinned_values():
    """Literal pins of the conversion pair (the mm23 oracle mirrors these
    formulas; if a constant or the rounding convention drifts, this
    fails before any catalog hash does)."""
    assert _rgb_to_ycbcr(90, 130, 200) == (126, 170, 102)
    assert _ycbcr_to_rgb(126, 170, 102) == (90, 130, 200)
    assert _ycbcr_to_rgb(130, 170, 102) == (94, 134, 204)
    assert _rgb_to_ycbcr(0, 0, 0) == (0, 128, 128)
    assert _rgb_to_ycbcr(255, 255, 255) == (255, 128, 128)
    # clamping: saturated red pushes Cr past 255
    assert _rgb_to_ycbcr(255, 0, 0) == (76, 85, 255)


# ---------------------------------------------------------------------------
# error contracts (raise, never fake pixels)
# ---------------------------------------------------------------------------


def test_subsampled_color_raises():
    """4:2:0 sampling in SOF0 must raise — the upsampling filter is
    decoder-specific, so no arithmetic oracle can pin its output."""
    payload = encode_jpeg_color(
        [[v for _ in range(8) for v in (1, 2, 3)] for _ in range(8)]
    )
    sof_at = payload.find(b"\xff\xc0")
    mutated = bytearray(payload)
    mutated[sof_at + 11] = 0x22  # Y component sampling 1x1 -> 2x2
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(mutated))


def test_two_component_raises():
    payload = encode_jpeg_color(
        [[v for _ in range(8) for v in (1, 2, 3)] for _ in range(8)]
    )
    sof_at = payload.find(b"\xff\xc0")
    mutated = bytearray(payload)
    mutated[sof_at + 9] = 2  # ncomp 3 -> 2
    with pytest.raises(ValueError, match="1-component|3-component"):
        decode_jpeg(bytes(mutated))


def test_gray_path_untouched():
    """The color extension must not perturb the grayscale profile."""
    rows = [[(x // 8 * 7 + y // 8 * 11 + 5) % 256 for x in range(19)] for y in range(17)]
    payload = encode_jpeg_gray(rows)
    assert is_jpeg(payload)
    w, h, c, got = decode_jpeg(payload)
    assert (w, h, c, got) == (19, 17, 1, rows)


def test_decode_image_routes_color_jpeg():
    from bioeco_portal_etl_spark.multimodal.media import decode_image

    rows = [[v for _ in range(8) for v in (90, 130, 200)] for _ in range(8)]
    w, h, c, got = decode_image(encode_jpeg_color(rows))
    assert (w, h, c) == (8, 8, 3)
    assert tuple(got[0][:3]) == (90, 130, 200)
