"""The optional-Pillow arm of the decode_image seam (VERDICT r7 #7).

Three layers, so the seam is fully exercised even though this container
has no Pillow:

1. WITHOUT Pillow: non-PNG/JPEG payloads raise NotImplementedError and
   unsupported JPEG profiles re-raise the codec's ValueError (the
   "raise, never fake pixels" contract survives the new fallback).
2. WITH a STAND-IN PIL planted in sys.modules: the dispatch routes WebP
   magic and subsampled-JPEG ValueErrors into _pil_decode, and
   _pil_decode's own row-flattening (L vs RGB, context manager, convert)
   produces the exact (w, h, channels, rows) shapes the stdlib codecs do.
3. WITH REAL Pillow (importorskip — skipped in this container): a PNG
   from our own encoder decodes byte-identically through _pil_decode,
   proving the two arms agree where they overlap.
"""

from __future__ import annotations

import sys
import types

import pytest

from bioeco_portal_etl_spark.multimodal import media
from bioeco_portal_etl_spark.multimodal.png import decode_png, encode_png

_WEBP = b"RIFF\x2a\x00\x00\x00WEBPVP8 "  # container magic only

# A JPEG that IS a JPEG (SOI + valid DQT/SOF0 framing) but declares 4:2:0
# sampling, which the stdlib codec rejects with ValueError: SOI, then SOF0
# with one component sampled 0x22.
_SUBSAMPLED_JPEG = bytes(
    [0xFF, 0xD8]  # SOI
    + [0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08, 0x01]  # SOF0 8x8
    + [0x01, 0x22, 0x00]  # component 1, sampling 2x2, qtable 0
    + [0xFF, 0xD9]  # EOI
)

_HAVE_REAL_PIL = media._pil_available()


@pytest.mark.skipif(_HAVE_REAL_PIL, reason="Pillow present: fallback fires")
def test_webp_without_pil_raises_notimplemented():
    with pytest.raises(NotImplementedError, match="install Pillow"):
        media.decode_image(_WEBP)


@pytest.mark.skipif(_HAVE_REAL_PIL, reason="Pillow present: fallback fires")
def test_unsupported_jpeg_without_pil_reraises_valueerror():
    with pytest.raises(ValueError, match="subsampled"):
        media.decode_image(_SUBSAMPLED_JPEG)


class _FakeImage:
    """Minimal Pillow-Image stand-in driving _pil_decode's full surface:
    context manager, load(), mode, convert(), size, getdata()."""

    def __init__(self, mode, size, data):
        self.mode, self.size, self._data = mode, size, data
        self.converted_to = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def load(self):
        pass

    def convert(self, mode):
        assert mode == "RGB"
        self.converted_to = mode
        out = _FakeImage("RGB", self.size, self._data)
        return out

    def getdata(self):
        return self._data


def _plant_fake_pil(monkeypatch, img):
    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda _buf: img
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)


def test_fake_pil_grayscale_rows_shape(monkeypatch):
    img = _FakeImage("L", (3, 2), [10, 20, 30, 40, 50, 60])
    _plant_fake_pil(monkeypatch, img)
    assert media.decode_image(_WEBP) == (3, 2, 1, [[10, 20, 30], [40, 50, 60]])
    assert img.converted_to is None  # L stays 1-channel, no convert


def test_fake_pil_rgb_rows_flatten(monkeypatch):
    px = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    img = _FakeImage("P", (2, 2), px)  # palette mode forces convert("RGB")
    _plant_fake_pil(monkeypatch, img)
    assert media.decode_image(_WEBP) == (
        2,
        2,
        3,
        [[1, 2, 3, 4, 5, 6], [7, 8, 9, 10, 11, 12]],
    )
    assert img.converted_to == "RGB"


def test_fake_pil_catches_unsupported_jpeg_profile(monkeypatch):
    img = _FakeImage("L", (1, 1), [128])
    _plant_fake_pil(monkeypatch, img)
    assert media.decode_image(_SUBSAMPLED_JPEG) == (1, 1, 1, [[128]])


def test_supported_codecs_never_touch_pil(monkeypatch):
    """PNG and baseline JPEG must stay on the stdlib arms even when PIL
    exists — a PIL whose open() explodes proves neither path imports it."""
    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")

    def _boom(_buf):
        raise AssertionError("stdlib-decodable payload routed to PIL")

    pil_image.open = _boom
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)
    rows = [[7, 8, 9], [10, 11, 12]]
    payload = encode_png(rows, channels=3)
    assert media.decode_image(payload) == (1, 2, 3, rows)


def test_real_pil_agrees_with_stdlib_png_codec():
    pytest.importorskip("PIL.Image")
    rows = [
        [(x * 3 + y * 5 + c * 11) % 256 for x in range(4) for c in range(3)]
        for y in range(3)
    ]
    payload = encode_png(rows, channels=3)
    assert media._pil_decode(payload) == decode_png(payload)
