#!/usr/bin/env python
"""Stdlib/numpy baseline-JPEG codec throughput (the lossy counterpart of
tools/png_bench.py).

The DCT/quantization/color layers are batched numpy; the entropy
(Huffman) layer is a Python loop over symbols — this bench measures the
MB/s-per-core boundary by quality and subsampling so a real-corpus user
knows when to require PIL/turbojpeg (magic-byte dispatch routes there
automatically when installed).  Appends a section to BENCH.md when
--write is passed.

Usage: python tools/jpeg_bench.py [--write] [--size 512]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from marginaliasearch_spark.functions.imagecodec import psnr  # noqa: E402
from marginaliasearch_spark.functions.jpegcodec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)


def make_test_image(n: int) -> np.ndarray:
    """Gradient + mild noise — photograph-like spectral shape (pure noise
    under-states real-world compressibility; pure gradient over-states it)."""
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:n, 0:n]
    base = np.stack(
        [
            128 + 70 * np.sin(xx / 37.0),
            128 + 60 * np.cos(yy / 29.0),
            120 + 50 * np.sin((xx + yy) / 53.0),
        ],
        axis=-1,
    )
    return np.clip(base + rng.normal(0, 4, base.shape), 0, 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="append to BENCH.md")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    n = args.size
    arr = make_test_image(n)
    raw_mb = arr.nbytes / 1e6

    lines = [
        "",
        f"### Stdlib/numpy JPEG codec throughput ({n}x{n}, single core)",
        "",
        "| quality | subsampling | compressed kB | PSNR dB | encode MB/s (raw) | decode MB/s (raw) | decode MB/s (compressed) |",
        "|---|---|---|---|---|---|---|",
    ]
    for quality, sub in ((85, "420"), (92, "444"), (98, "444")):
        data = encode_jpeg(arr, quality, sub)
        t0 = time.perf_counter()
        encode_jpeg(arr, quality, sub)
        enc_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        dec = decode_jpeg(data)
        dec_s = time.perf_counter() - t0
        p = psnr(arr, dec)
        lines.append(
            f"| {quality} | {sub} | {len(data) / 1e3:.0f} | {p:.1f} "
            f"| {raw_mb / enc_s:.1f} | {raw_mb / dec_s:.1f} "
            f"| {len(data) / 1e6 / dec_s:.2f} |"
        )
    lines.append("")
    lines.append(
        "Boundary note: decode is entropy-bound (sequential Huffman in "
        "Python); a real-world 100-TB image corpus should install "
        "PIL/turbojpeg — `decode_image` dispatches there automatically by "
        "magic bytes — while this always-on path guarantees the "
        "PSNR>=40dB invariant is executable in any environment."
    )
    report = "\n".join(lines)
    print(report)
    if args.write:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"),
            "a",
        ) as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
