"""Audio/video payload plumbing — opaque binary columns, typed metadata,
vectorized decode / feature-extract / frame-sample.

Same honesty contract as functions/imagecodec.py: this container image
has no media libraries (no PyAV/ffmpeg/soundfile), so the CONTAINER
FORMAT is a documented deterministic stand-in — but everything Spark-side
is real and everything numerical is real numpy math:

- audio: int16 PCM frames in a tiny header container; decode → float32
  waveform; features = per-window RMS energy + dominant-frequency bin via
  rFFT (real spectral analysis, no per-row Python — one numpy pass per
  Arrow batch);
- video: a sequence of imagecodec-encoded frames in a length-prefixed
  container; frame-sample every k-th frame, per-frame phash, and
  shot-boundary detection by phash hamming jumps.

Swap `decode_audio` / `iter_video_frames` for PyAV in production; the
schemas, batch shapes and mapInPandas signatures do not change.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from .imagecodec import decode_image, encode_image, hamming64, phash64

_AUDIO_MAGIC = b"MSA1"
_VIDEO_MAGIC = b"MSV1"


# ---------------------------------------------------------------------------
# audio container (deterministic stand-in; production: PyAV/soundfile)
# ---------------------------------------------------------------------------


def encode_audio(wave: np.ndarray, sample_rate: int) -> bytes:
    pcm = np.clip(wave * 32767.0, -32768, 32767).astype("<i2")
    return _AUDIO_MAGIC + struct.pack("<ii", sample_rate, len(pcm)) + pcm.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """→ (float32 waveform in [-1, 1], sample_rate)."""
    if data[:4] != _AUDIO_MAGIC:
        raise ValueError("not an MSA1 audio payload")
    sample_rate, n = struct.unpack("<ii", data[4:12])
    pcm = np.frombuffer(data, dtype="<i2", offset=12, count=n)
    return pcm.astype(np.float32) / 32767.0, sample_rate


def audio_features(wave: np.ndarray, sample_rate: int, window: int = 1024) -> dict:
    """RMS energy + dominant-frequency estimate (real rFFT math)."""
    n = len(wave)
    if n == 0:
        return {"rms": 0.0, "peak_hz": 0.0, "n_windows": 0}
    n_win = max(n // window, 1)
    trimmed = wave[: n_win * window].reshape(n_win, -1)
    rms = float(np.sqrt((trimmed**2).mean()))
    spec = np.abs(np.fft.rfft(trimmed, axis=1)).mean(axis=0)
    spec[0] = 0.0  # ignore DC
    peak_bin = int(np.argmax(spec))
    peak_hz = peak_bin * sample_rate / trimmed.shape[1]
    return {"rms": rms, "peak_hz": float(peak_hz), "n_windows": int(n_win)}


# ---------------------------------------------------------------------------
# video container (sequence of imagecodec frames; production: PyAV)
# ---------------------------------------------------------------------------


def encode_video(frames: list[np.ndarray], fps: int, fmt: str = "png") -> bytes:
    out = [_VIDEO_MAGIC, struct.pack("<ii", fps, len(frames))]
    for f in frames:
        blob = encode_image(f, fmt)
        out.append(struct.pack("<i", len(blob)))
        out.append(blob)
    return b"".join(out)


def iter_video_frames(data: bytes) -> Iterator[np.ndarray]:
    if data[:4] != _VIDEO_MAGIC:
        raise ValueError("not an MSV1 video payload")
    _, n_frames = struct.unpack("<ii", data[4:12])
    off = 12
    for _ in range(n_frames):
        (ln,) = struct.unpack("<i", data[off : off + 4])
        off += 4
        frame, _ = decode_image(data[off : off + ln])
        off += ln
        yield frame


def video_meta(data: bytes) -> tuple[int, int]:
    if data[:4] != _VIDEO_MAGIC:
        raise ValueError("not an MSV1 video payload")
    fps, n_frames = struct.unpack("<ii", data[4:12])
    return fps, n_frames


def sample_frames(data: bytes, every_k: int) -> list[tuple[int, np.ndarray]]:
    """Every k-th frame (frame_idx, array) — the frame-sample primitive."""
    return [
        (i, f) for i, f in enumerate(iter_video_frames(data)) if i % every_k == 0
    ]


def shot_boundaries(data: bytes, every_k: int = 1, hamming_threshold: int = 16) -> list[int]:
    """Frame indices where the phash jumps by ≥ threshold vs the previous
    sampled frame — the classic cheap shot-boundary detector."""
    prev = None
    cuts = []
    for i, f in sample_frames(data, every_k):
        h = phash64(f)
        if prev is not None and hamming64(h, prev) >= hamming_threshold:
            cuts.append(i)
        prev = h
    return cuts
