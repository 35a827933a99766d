#!/usr/bin/env python
"""Stdlib-PNG decode throughput by filter type (VERDICT r4 item 6).

Real-world PNGs are mostly Paeth-filtered; the always-on stdlib decoder
reconstructs None/Up/Sub scanlines vectorized (Sub = per-channel cumsum)
but Average/Paeth in hoisted pure-Python byte loops — this bench
measures the MB/s-per-core boundary so a real-corpus user knows when to
require PIL.  Appends a section to BENCH.md when --write is passed.

Usage: python tools/png_bench.py [--write] [--size 512]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from marginaliasearch_spark.functions.imagecodec import (  # noqa: E402
    decode_image,
    encode_png,
)

FILTER_NAMES = {0: "None", 1: "Sub", 2: "Up", 3: "Average", 4: "Paeth"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="append to BENCH.md")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    n = args.size
    rng = np.random.default_rng(42)
    # gradient + noise: realistic filter deltas (pure noise under-favors
    # Paeth; pure gradient over-favors it)
    gx = np.linspace(0, 255, n, dtype=np.float64)
    arr = (
        (gx[None, :, None] * 0.5 + gx[:, None, None] * 0.5)
        + rng.normal(0, 12, size=(n, n, 3))
    ).clip(0, 255).astype(np.uint8)
    raw_mb = arr.nbytes / 1e6

    rows = []
    for ftype, fname in FILTER_NAMES.items():
        data = encode_png(arr, filter_type=ftype)
        dec, _ = decode_image(data)
        assert np.array_equal(dec, arr), f"filter {ftype} round-trip drifted"
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            decode_image(data)
        sec = (time.perf_counter() - t0) / reps
        rows.append((fname, round(raw_mb / sec, 1), round(sec * 1000, 1)))
        print(f"  {fname:8s} {raw_mb / sec:8.1f} MB/s  ({sec * 1000:.1f} ms / {n}x{n})")

    if args.write:
        md = (
            f"\n## Stdlib PNG decode throughput by filter type ({n}x{n} RGB, "
            f"{raw_mb:.2f} MB raw, tools/png_bench.py)\n\n"
            "| filter | MB/s/core | ms/image |\n|---|---|---|\n"
            + "".join(f"| {f} | {mbs} | {ms} |\n" for f, mbs, ms in rows)
            + "\nNone/Up/Sub are vectorized (Sub = per-channel cumsum); "
            "Average/Paeth run hoisted pure-Python byte loops — the\n"
            "documented boundary: a Paeth-heavy real-world corpus should "
            "install PIL (the codec auto-prefers it when importable);\n"
            "the stdlib path guarantees the gate/payload pipeline runs "
            "everywhere.\n"
        )
        with open(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"),
            "a",
        ) as f:
            f.write(md)


if __name__ == "__main__":
    main()
