"""The optional-PyAV arm of the decode_audio seam (VERDICT r8 #5 — the
ffmpeg-class decision, mirroring tests/test_media_pil_seam.py).

Three layers, so the seam is fully exercised even though this container
has no PyAV:

1. WITHOUT PyAV: RIFF/WAVE decodes for real through the stdlib codec and
   anything else raises NotImplementedError (the "raise, never fake
   samples" contract).
2. WITH a STAND-IN ``av`` planted in sys.modules: the dispatch routes
   non-WAV magic into _av_decode_audio, and _av_decode_audio's own frame
   loop (context manager, stream pick, float->int16 scaling, planar
   multi-channel mixdown, clipping) produces the exact
   (sample_rate, mono int16 list) shape decode_wav produces.
3. WITH REAL PyAV (importorskip — skipped in this container): a WAV from
   our own encoder decodes through the av arm to the same samples,
   proving the two arms agree where they overlap.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from bioeco_portal_etl_spark.multimodal import media
from bioeco_portal_etl_spark.multimodal.wavpcm import decode_wav, encode_wav

_MP3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes(64)  # container magic only

_HAVE_REAL_AV = media._av_available()


def test_wav_decodes_without_av():
    payload = encode_wav([0, 100, -100, 32767, -32768], sample_rate=8000)
    assert media.decode_audio(payload) == (8000, [0, 100, -100, 32767, -32768])


@pytest.mark.skipif(_HAVE_REAL_AV, reason="PyAV present: fallback fires")
def test_mp3_without_av_raises_notimplemented():
    with pytest.raises(NotImplementedError, match="install PyAV"):
        media.decode_audio(_MP3)


class _FakeFrame:
    def __init__(self, arr, rate, channels=None):
        self._arr, self.sample_rate = arr, rate
        if channels is not None:
            # mirror real PyAV: frame.layout.channels is a tuple
            self.layout = types.SimpleNamespace(
                channels=tuple(range(channels))
            )

    def to_ndarray(self):
        return self._arr


class _FakeContainer:
    """Minimal PyAV-container stand-in driving _av_decode_audio's full
    surface: context manager, streams list with .type, decode(stream)."""

    def __init__(self, frames):
        self._frames = frames
        self.streams = [
            types.SimpleNamespace(type="video"),
            types.SimpleNamespace(type="audio"),
        ]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def decode(self, stream):
        assert stream.type == "audio", "must pick the audio stream"
        return iter(self._frames)


def _plant_fake_av(monkeypatch, frames):
    fake = types.ModuleType("av")
    fake.open = lambda _buf: _FakeContainer(frames)
    monkeypatch.setitem(sys.modules, "av", fake)


def test_fake_av_packed_int16_passthrough(monkeypatch):
    _plant_fake_av(
        monkeypatch,
        [
            _FakeFrame(np.array([[1, -2, 3]], dtype=np.int16), 22050),
            _FakeFrame(np.array([[4, 5]], dtype=np.int16), 22050),
        ],
    )
    assert media.decode_audio(_MP3) == (22050, [1, -2, 3, 4, 5])


def test_fake_av_planar_stereo_mixdown_and_float_scaling(monkeypatch):
    # planar float stereo: per-sample channel mean, scaled to int16
    arr = np.array([[0.5, -1.0], [0.5, 1.0]], dtype=np.float32)
    _plant_fake_av(monkeypatch, [_FakeFrame(arr, 44100)])
    rate, samples = media.decode_audio(_MP3)
    assert rate == 44100
    assert samples == [16384, 0]  # mean(.5,.5)*32767 rounds to 16384; mean(-1,1)=0


def test_fake_av_packed_stereo_mixdown(monkeypatch):
    """PACKED multi-channel: to_ndarray() is (1, n*ch) interleaved
    (ffmpeg's FLAC decoder emits packed s16/s32). A shape-only mixdown
    check misses this and returns 2x-length interleaved L/R (ADVICE
    r9); the frame's layout channel count must trigger the
    reshape(-1, ch) mean."""
    # interleaved L,R pairs: (10,20) (30,50) (-100,100)
    arr = np.array([[10, 20, 30, 50, -100, 100]], dtype=np.int16)
    _plant_fake_av(monkeypatch, [_FakeFrame(arr, 48000, channels=2)])
    assert media.decode_audio(_MP3) == (48000, [15, 40, 0])


def test_fake_av_packed_stereo_float_mixdown(monkeypatch):
    # packed float stereo: scale to int16 THEN per-sample channel mean
    arr = np.array([[0.5, 0.5, -1.0, 1.0]], dtype=np.float32)
    _plant_fake_av(monkeypatch, [_FakeFrame(arr, 44100, channels=2)])
    assert media.decode_audio(_MP3) == (44100, [16384, 0])


def test_fake_av_packed_mono_with_layout_passthrough(monkeypatch):
    # a (1, n) frame WITH a mono layout must not be reshaped/averaged
    arr = np.array([[7, -8, 9]], dtype=np.int16)
    _plant_fake_av(monkeypatch, [_FakeFrame(arr, 8000, channels=1)])
    assert media.decode_audio(_MP3) == (8000, [7, -8, 9])


def test_fake_av_clips_to_int16_range(monkeypatch):
    arr = np.array([[2.0, -2.0]], dtype=np.float64)  # out-of-range floats
    _plant_fake_av(monkeypatch, [_FakeFrame(arr, 16000)])
    assert media.decode_audio(_MP3) == (16000, [32767, -32768])


def test_planar_and_packed_layouts_decode_identically(monkeypatch):
    """Property (hypothesis-driven): the SAME logical multi-channel
    audio delivered planar ((ch, n)) and packed ((1, n*ch) interleaved)
    must produce byte-identical mono output — the invariant the ADVICE
    r9 packed-mixdown bug violated (packed returned 2x-length
    interleaved L/R)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(2, 4),  # channels
        st.lists(st.integers(-32768, 32767), min_size=2, max_size=40),
    )
    def run(ch, flat):
        n = len(flat) // ch
        if n == 0:
            return
        flat = flat[: n * ch]
        planar = np.array(
            [[flat[i * ch + c] for i in range(n)] for c in range(ch)],
            dtype=np.int16,
        )
        packed = np.array([flat], dtype=np.int16)
        _plant_fake_av(monkeypatch, [_FakeFrame(planar, 16000)])
        via_planar = media.decode_audio(_MP3)
        _plant_fake_av(monkeypatch, [_FakeFrame(packed, 16000, channels=ch)])
        via_packed = media.decode_audio(_MP3)
        assert via_planar == via_packed
        assert len(via_planar[1]) == n  # mono, per-sample mean

    run()


def test_real_av_agrees_with_stdlib_wav_codec():
    pytest.importorskip("av")
    samples = [(i * 13) % 2048 - 1024 for i in range(800)]
    payload = encode_wav(samples, sample_rate=16000)
    rate, via_av = media._av_decode_audio(payload)
    assert (rate, via_av) == decode_wav(payload)
