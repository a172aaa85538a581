"""Real PCM WAV encode/decode on in-memory bytes — the audio twin of
multimodal/png.py: a genuine RIFF/WAVE codec (stdlib ``wave`` + ``struct``,
nothing to install) so the audio stages of the media pipeline can be proven
end-to-end on real container bytes instead of the ASCII stand-in payloads
mm4 documents (multimodal/media.py audio_frame_features).

The reference has no audio surface at all (854 lines of R over tabular/geo
data — `notebooks/index.Rmd`); this exists for the training-data-pipeline
extension, where audio arrives as opaque binary + typed metadata and the
first executor-side stage is exactly this: parse the container, get PCM,
reduce to features. Mono 16-bit little-endian PCM is the interchange
format every resampler/featurizer accepts.

Scale posture: both functions are pure bytes->bytes/ints helpers invoked
inside Arrow ``mapInPandas`` batches (see media.py synth_pcm_wav /
wav_clip_stats) — payloads never cross to the JVM, and per-clip work is
O(samples) with no Python-loop-over-rows on the Spark side.
"""

from __future__ import annotations

import io
import struct
import wave

try:  # vectorized sample (un)packing; stdlib path is the byte-identical
    # fallback and reference (round-13, guide §4.2 — same convention as
    # multimodal/jpeg.py)
    import numpy as _np
except ImportError:  # pragma: no cover - numpy present in all test envs
    _np = None

SAMPLE_RATE = 16000


def encode_wav(samples, sample_rate: int = SAMPLE_RATE) -> bytes:
    """Mono 16-bit PCM WAV bytes for ``samples`` (ints in [-32768, 32767];
    list or 1-D integer numpy array). Deterministic: fixed
    rate/width/channels, no metadata chunks beyond what ``wave`` always
    writes — byte-identical across runs and hosts. The numpy path packs
    via ``astype('<i2').tobytes()`` (identical little-endian int16 bytes
    to ``struct.pack``) with an explicit range check mirroring
    struct.pack's overflow error."""
    if _np is not None:
        arr = _np.asarray(samples, dtype=_np.int64)
        if arr.size and (arr.min() < -32768 or arr.max() > 32767):
            raise ValueError("sample out of int16 range")
        frames = arr.astype("<i2").tobytes()
    else:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """(sample_rate, samples) from mono 16-bit PCM WAV bytes. Raises on
    anything else — a curation pipeline wants loud failures on codec
    surprises, not silently resampled garbage."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                "expected mono 16-bit PCM, got "
                f"{w.getnchannels()}ch/{8 * w.getsampwidth()}-bit"
            )
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    return rate, list(struct.unpack(f"<{n}h", raw))


def decode_wav_np(payload: bytes):
    """(sample_rate, int64 numpy array) — the vectorized twin of
    :func:`decode_wav` for numpy-path consumers (round-13, guide §4.2):
    ``frombuffer('<i2')`` reads the identical little-endian int16 frames,
    widened to int64 so downstream integer arithmetic (energy sums,
    products) cannot overflow. Raises exactly like decode_wav on
    non-mono/non-16-bit input; falls back to decode_wav without numpy."""
    if _np is None:  # pragma: no cover - numpy present in all test envs
        rate, s = decode_wav(payload)
        return rate, s
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                "expected mono 16-bit PCM, got "
                f"{w.getnchannels()}ch/{8 * w.getsampwidth()}-bit"
            )
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    return rate, _np.frombuffer(raw, dtype="<i2").astype(_np.int64)
