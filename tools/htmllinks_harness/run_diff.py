#!/usr/bin/env python
"""Drive the compiled-reference LinkParser differential over the HTML
fixture corpus: tokenize each fixture with the repo's Python tokenizer,
replay the element stream through the reference's own LinkParser
(compiled in place from /root/reference with stubbed third-party libs),
and diff against the repo's extract_links.

Usage:
  python tools/htmllinks_harness/run_diff.py            # diff only
  python tools/htmllinks_harness/run_diff.py --write    # regenerate tests/golden/htmllinks_diff.tsv

The fixture corpus and doc URLs live in tests/test_htmllinks.py (DOC_URLS).
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

HARNESS_DIR = os.path.join(REPO, "tools", "htmllinks_harness")
REF = "/root/reference/code"
REF_SOURCES = [
    f"{REF}/processes/crawling-process/ft-link-parser/java/nu/marginalia/link_parser/LinkParser.java",
    f"{REF}/common/model/java/nu/marginalia/model/EdgeUrl.java",
    f"{REF}/common/model/java/nu/marginalia/model/EdgeDomain.java",
    f"{REF}/common/model/java/nu/marginalia/util/QueryParams.java",
]
FIXTURES = os.path.join(REPO, "tests", "fixtures", "html")
GOLDEN = os.path.join(REPO, "tests", "golden", "htmllinks_diff.tsv")


def esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")


def unesc(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            n = s[i + 1]
            out.append("\t" if n == "t" else "\n" if n == "n" else n)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def compile_harness(workdir: str) -> str:
    classes = os.path.join(workdir, "classes")
    os.makedirs(classes, exist_ok=True)
    stubs = []
    for root, _, files in os.walk(os.path.join(HARNESS_DIR, "stubs")):
        stubs += [os.path.join(root, f) for f in files if f.endswith(".java")]
    sources = []
    import re

    for src in REF_SOURCES:
        text = open(src, encoding="utf-8").read()
        # JDK-21 bounded indexOf -> Jdk17Compat (JDK 17 in this image);
        # mechanical call-site rewrite on a TEMP COPY, semantics identical
        patched, n = re.subn(
            r"\burl\.indexOf\((.+?), (.+?), (.+?)\)",
            r"Jdk17Compat.indexOf(url, \1, \2, \3)",
            text,
        )
        if n:
            dst = os.path.join(workdir, os.path.basename(src))
            with open(dst, "w", encoding="utf-8") as fh:
                fh.write(patched)
            sources.append(dst)
        else:
            sources.append(src)
    cmd = (
        ["javac", "-encoding", "UTF-8", "-d", classes,
         os.path.join(HARNESS_DIR, "Harness.java")]
        + stubs
        + sources
    )
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        sys.stderr.write(res.stderr)
        raise SystemExit("javac failed")
    return classes


def doc_urls() -> dict:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "thl", os.path.join(REPO, "tests", "test_htmllinks.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return dict(mod.DOC_URLS)


def main() -> int:
    write = "--write" in sys.argv
    from marginaliasearch_spark.functions.htmllinks import (
        extract_link_elements,
        extract_links,
    )

    urls = doc_urls()
    with tempfile.TemporaryDirectory(prefix="hl_harness_") as workdir:
        classes = compile_harness(workdir)

        stream_path = os.path.join(workdir, "elements.tsv")
        with open(stream_path, "w", encoding="utf-8") as fh:
            for name in sorted(urls):
                html = open(os.path.join(FIXTURES, name), encoding="utf-8").read()
                fh.write(f"{name}\t{esc(urls[name])}\t\n")  # doc marker
                for tag, attrs in extract_link_elements(html):
                    fields = [name, esc(urls[name]), tag]
                    fields += [esc(f"{k}\u001f{v}") for k, v in attrs.items()]
                    fh.write("\t".join(fields) + "\n")

        res = subprocess.run(
            ["java", "-cp", classes, "Harness", stream_path],
            check=True, capture_output=True, text=True,
        )

    ref: dict = {name: [] for name in urls}
    lines = res.stdout.splitlines()
    for line in lines:
        name, seq, url = line.split("\t", 2)
        if seq == "ERR":
            print(f"REFERENCE HARNESS ERROR on {name}: {url}", file=sys.stderr)
            return 2
        if seq != "EMPTY":
            ref[name].append(unesc(url))

    bad = 0
    for name in sorted(urls):
        html = open(os.path.join(FIXTURES, name), encoding="utf-8").read()
        ours = extract_links(html, urls[name])
        if ours != ref[name]:
            bad += 1
            print(f"MISMATCH {name}:")
            for i in range(max(len(ours), len(ref[name]))):
                o = ours[i] if i < len(ours) else "<missing>"
                r = ref[name][i] if i < len(ref[name]) else "<missing>"
                mark = " " if o == r else "!"
                print(f"  {mark} {i:3d} ours={o!r} ref={r!r}")
    total = sum(len(v) for v in ref.values())
    print(f"{len(urls)} docs, {total} reference links, {bad} mismatched docs")

    if write:
        if bad:
            print("refusing to --write golden with mismatches", file=sys.stderr)
            return 1
        with open(GOLDEN, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {GOLDEN}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
