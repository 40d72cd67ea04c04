"""Pure-stdlib WAV (PCM) codec — the REAL audio-decode path for the
multimodal stage.

Like the PNG codec (``functions/png.py``), this removes the "no audio
library in the runtime" stub for the one format the standard library
can parse: RIFF/WAVE with 8/16/32-bit integer PCM. Encoder + decoder
round-trip exactly; unsupported payloads raise
``UnsupportedWavError`` and callers flag the row instead of crashing.
"""

from __future__ import annotations

import io
import wave

import numpy as np


class UnsupportedWavError(ValueError):
    pass


_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("need int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) float64 in [-1, 1], sample_rate)."""
    if not data or not data.startswith(b"RIFF"):
        raise UnsupportedWavError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as ex:
        raise UnsupportedWavError(str(ex)) from ex
    if width not in _WIDTH_DTYPE:
        raise UnsupportedWavError(f"sample width {width}")
    arr = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centered at 128
        arr = arr - 128.0
        scale = 128.0
    else:
        scale = float(2 ** (8 * width - 1))
    if nch > 1:
        arr = arr.reshape(-1, nch)
    else:
        arr = arr[:, None]
    return arr / scale, rate


def wav_features(samples: np.ndarray, rate: int, dim: int = 64) -> np.ndarray:
    """Deterministic ``dim``-float features from decoded audio:
    duration, rms, zero-crossing rate, peak, then a 32-bin log-power
    spectrum of the (mono-mixed) signal, zero-padded."""
    mono = samples.mean(axis=1)
    n = len(mono)
    feats = [
        min(n / max(rate, 1), 3600.0) / 3600.0,
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0,
        float(np.max(np.abs(mono))) if n else 0.0,
    ]
    if n:
        spec = np.abs(np.fft.rfft(mono, n=min(n, 4096))) ** 2
        bins = np.array_split(spec, 32)
        power = np.array([b.mean() if len(b) else 0.0 for b in bins])
        feats.extend(np.log1p(power) / 20.0)
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, len(feats))] = feats[:dim]
    return out
