#!/usr/bin/env python
"""HTML link-extraction kernel throughput (VERDICT r4 item 8).

Measures ``extract_links`` MB/s-per-core over a synthetic-but-realistic
corpus (anchor-dense listing pages, prose pages with scripts/comments,
adversarial attribute soup) — the number that decides how many cores a
100× corpus bridge needs for the enqueue-side parse.  Appends a section
to BENCH.md when --write is passed.

Usage: python tools/html_bench.py [--write] [--docs 400]
"""
from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marginaliasearch_spark.functions.htmllinks import extract_links  # noqa: E402

WORDS = (
    "granite harbor lantern meadow orchard pennant quarry russet timber "
    "cobalt drift ember fjord gully hollow inlet juniper knoll lagoon"
).split()


def make_doc(rng: random.Random, kind: str) -> str:
    parts = ["<!DOCTYPE html><html><head>"]
    parts.append(f"<title>{' '.join(rng.choices(WORDS, k=6))}</title>")
    if rng.random() < 0.3:
        parts.append('<base href="/section/">')
    parts.append("<script>var cfg = {a: 1, b: '<a href=\"/decoy\">'}; if (x<y) go();</script>")
    parts.append("<style>a[href]{color:#246}</style></head><body>")
    if kind == "listing":
        for i in range(rng.randint(80, 160)):
            slug = "-".join(rng.choices(WORDS, k=3))
            parts.append(f'<a href="/item/{i}/{slug}.html" rel="{rng.choice(["", "nofollow", "tag"])}">{slug}</a>')
    elif kind == "prose":
        for _ in range(rng.randint(30, 60)):
            parts.append("<p>" + " ".join(rng.choices(WORDS, k=40)) + "</p>")
            if rng.random() < 0.4:
                slug = rng.choice(WORDS)
                parts.append(f'<a href="../{slug}/">{slug}</a>')
        parts.append("<!-- " + " ".join(rng.choices(WORDS, k=30)) + " -->")
    else:  # soup
        for _ in range(rng.randint(40, 80)):
            w = rng.choice(WORDS)
            parts.append(f"<a href=/u/{w} class={w} data-x='{w}' href=/dup>{w}")
        parts.append('<meta http-equiv="refresh" content="5; url=/next">')
        parts.append('<frame src="/f.html"><iframe src="/g.html"></iframe>')
    parts.append("</body></html>")
    return "".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="append to BENCH.md")
    ap.add_argument("--docs", type=int, default=400)
    args = ap.parse_args()

    rng = random.Random(42)
    corpus = [
        (make_doc(rng, kind), f"https://bench{i}.example.org/dir/page.html")
        for i, kind in enumerate(
            rng.choices(["listing", "prose", "soup"], k=args.docs)
        )
    ]
    total_mb = sum(len(h.encode()) for h, _ in corpus) / 1e6

    # warm-up (regex compile, import costs)
    for h, u in corpus[:20]:
        extract_links(h, u)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n_links = 0
        for h, u in corpus:
            n_links += len(extract_links(h, u))
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)

    mbps = total_mb / best
    docs_s = len(corpus) / best
    print(
        f"{len(corpus)} docs / {total_mb:.1f} MB, {n_links} links: "
        f"{mbps:.1f} MB/s/core, {docs_s:.0f} docs/s/core (best of 3)"
    )

    if args.write:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH.md"), "a") as fh:
            fh.write(
                f"\n## HTML link-extraction kernel throughput\n\n"
                f"`extract_links` over a {len(corpus)}-doc synthetic corpus "
                f"({total_mb:.1f} MB: anchor-dense listings, prose with "
                f"scripts/comments, adversarial attribute soup): "
                f"**{mbps:.1f} MB/s/core** ({docs_s:.0f} docs/s/core, "
                f"{n_links} links, best of 3).  At 32 cores that is "
                f"~{mbps * 32 / 1000:.1f} GB/s per node of enqueue-side HTML "
                f"parse — the politeness-bounded fetch path, not the parse, "
                f"stays the crawl bottleneck at 100×.\n"
            )
        print("appended to BENCH.md")


if __name__ == "__main__":
    main()
