"""Deterministic image codec + perceptual hash for the image+caption payload.

The crawl payload per BASELINE.json ``input_hint`` is an image+caption pair
``(image_id, bytes, w, h, fmt, caption, phash)`` with a per-row invariant of
decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats).

Codec dispatch: ``decode_image`` sniffs the container's magic bytes.
Real PNG/JPEG/WEBP payloads decode through PIL when it is importable
(``HAVE_PIL``); the deterministic "MSPK" stand-in container
(zlib-compressed raw pixels, with 6-bit quantization standing in for
lossy compression at PSNR ≈ 46 dB) always works and is what this
image-library-free sandbox exercises.  Which backend handled a payload is
surfaced per row by the validate plan (``image_backend_of``).  The
Spark-side plumbing — binary columns, Arrow batch shapes, mapInPandas
decode/validate signatures — is identical under both backends; a
skipped-unless-PIL test drives the real path end-to-end.

The perceptual hash is the classic pHash construction: 32×32 grayscale →
2D DCT-II → top-left 8×8 (skipping DC) → median threshold → 64 bits.
The reference's content-similarity analogue is EasyLSH with hamming < 4
(ref: code/libraries/easy-lsh/java/nu/marginalia/lsh/EasyLSH.java:12-87);
for the image graft the same "is same content" check is
``hamming64(phash_a, phash_b) < 4``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# pluggable real codec: PIL decodes/encodes actual PNG/JPEG/WEBP when
# installed; the deterministic MSPK stand-in is always available and is
# selected by container sniffing (magic bytes), exactly how a production
# decode path dispatches
try:  # pragma: no cover - container has no PIL; exercised where it does
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

IMAGE_BACKEND = "pil" if HAVE_PIL else "stub"

MAGIC = b"MSPK"
LOSSY_FORMATS = frozenset({"jpeg", "webp"})
_FMT_CODES = {"png": 0, "jpeg": 1, "webp": 2}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}


def image_backend_of(data: bytes) -> str:
    """Which decoder a payload will route to: 'stub' for the MSPK
    container, 'pil' for real formats when PIL is importable, 'none'
    otherwise (decode will raise)."""
    if data and bytes(data[:4]) == MAGIC:
        return "stub"
    return "pil" if HAVE_PIL else "none"


def encode_image(arr: np.ndarray, fmt: str, backend: str = "stub") -> bytes:
    """arr: HxWx3 uint8 → container bytes.

    backend='stub' (default, always available, deterministic): MSPK
    container, lossy fmts quantized to 6 bits.  backend='pil': real
    PNG/JPEG/WEBP bytes via PIL (raises if PIL is absent)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 uint8")
    if fmt not in _FMT_CODES:
        raise ValueError(f"unknown fmt {fmt!r}")
    if backend == "pil":
        if not HAVE_PIL:
            raise ValueError("PIL not available for backend='pil'")
        import io

        buf = io.BytesIO()
        _PILImage.fromarray(arr, "RGB").save(buf, format=fmt.upper())
        return buf.getvalue()
    h, w, _ = arr.shape
    payload = arr
    if fmt in LOSSY_FORMATS:
        payload = (arr >> 2).astype(np.uint8)  # 6-bit quantization (lossy stand-in)
    compressed = zlib.compress(payload.tobytes(), level=6)
    return MAGIC + struct.pack("<BHH", _FMT_CODES[fmt], w, h) + compressed


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """container bytes → (HxWx3 uint8, fmt), dispatched on magic bytes:
    MSPK → deterministic stub; anything else → PIL when installed.
    Raises ValueError on corruption or an undecodable container."""
    if not data:
        raise ValueError("empty payload")
    data = bytes(data)
    if data[:4] != MAGIC:
        if HAVE_PIL:
            import io

            with _PILImage.open(io.BytesIO(data)) as im:
                fmt = (im.format or "").lower()
                fmt = {"jpg": "jpeg"}.get(fmt, fmt)
                arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
            return arr, fmt
        raise ValueError("bad magic (and no real codec installed)")
    fmt_code, w, h = struct.unpack("<BHH", data[4:9])
    fmt = _FMT_NAMES.get(fmt_code)
    if fmt is None:
        raise ValueError("bad fmt code")
    raw = zlib.decompress(data[9:])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if fmt in LOSSY_FORMATS:
        # dequantize to bucket centers to minimize error
        arr = np.minimum(arr.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
    return arr, fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --- perceptual hash -------------------------------------------------------

_DCT_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT_M = _dct_matrix(_DCT_N)


def _resize_block_mean(gray: np.ndarray, out: int) -> np.ndarray:
    """Nearest-bucket block-mean resize to out×out (deterministic)."""
    h, w = gray.shape
    ys = (np.arange(out + 1) * h // out).astype(np.int64)
    xs = (np.arange(out + 1) * w // out).astype(np.int64)
    # non-empty buckets for tiny images come from the upscale branch below
    # (it rebuilds ys/xs after repetition)
    if h < out or w < out:
        # upscale tiny images by repetition first
        ry = int(np.ceil(out / h))
        rx = int(np.ceil(out / w))
        gray = np.repeat(np.repeat(gray, ry, axis=0), rx, axis=1)
        h, w = gray.shape
        ys = (np.arange(out + 1) * h // out).astype(np.int64)
        xs = (np.arange(out + 1) * w // out).astype(np.int64)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = np.cumsum(np.cumsum(gray.astype(np.float64), axis=0), axis=1)
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = (
        csum[np.ix_(y1, x1)]
        - csum[np.ix_(y0, x1)]
        - csum[np.ix_(y1, x0)]
        + csum[np.ix_(y0, x0)]
    )
    return s / np.maximum(area, 1)


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash (signed int64, parquet-friendly)."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_block_mean(gray, _DCT_N)
    dct = _DCT_M @ small @ _DCT_M.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term
    bits = block > med
    bits[0] = dct[0, 0] > 0
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def phash_batch(bufs) -> np.ndarray:
    """Decode+phash a batch of encoded images → int64 array (−1 on decode error)."""
    out = np.empty(len(bufs), dtype=np.int64)
    for i, buf in enumerate(bufs):
        try:
            arr, _ = decode_image(bytes(buf))
            out[i] = phash64(arr)
        except (ValueError, zlib.error):
            out[i] = -1
    return out
