"""URL blocklist — enqueue-time admission control.

Reimplements UrlBlocklist semantics (ref: code/processes/crawling-process/
ft-crawl-blocklist/java/nu/marginalia/ip_blocklist/UrlBlocklist.java:11-115):
bad top-domains, git/upload/download-free paths, ≥32-char lowercase-hex runs,
eight link-farm patterns (guard substring + regex search), optional
mailing-list filter.

Provided in two equivalent forms:
- ``is_url_blocked(EdgeUrl)`` — plain Python, used by the oracle crawler;
- ``blocked_col(domain_top, path)`` — a pure Spark Column expression
  (rlike/contains, whole-stage-codegen friendly, no UDF) used by the
  distributed pipeline.  Equivalence is asserted in tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..canon.url import EdgeUrl

BAD_TOP_DOMAINS = frozenset(
    {"t.co", "facebook.com", "instagram.com", "youtube.com", "youtu.be", "amzn.to"}
)

# (guard substring, java-regex) pairs; semantics = contains(guard) AND regex-search
_LINK_FARM_PATTERNS: list[tuple[str, str]] = [
    ("/download", r"/download(-([A-Za-z]+|[0-9]+)){4,}\.(htm|html|php)$"),
    ("/permalink", r"/permalink/[a-z]+(-([A-Za-z]+|[0-9]+)){3,}\.(htm|html|php)$"),
    ("webrx", r"webrx3.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$"),
    ("lib", r"lib.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$"),
    ("pdf", r"pdf.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$"),
    ("book", r"book.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$"),
    ("720p", r"720p.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$"),
    ("/node", r"/node/.*/[a-z]+(-[a-z0-9]+)+.htm$"),
]

_COMPILED = [(g, re.compile(rx)) for g, rx in _LINK_FARM_PATTERNS]

_HEX_RUN_RE = re.compile(r"[0-9a-f]{32}")


def hash_test(path: str) -> bool:
    """≥32-char run of [0-9a-f] in paths longer than 34 chars."""
    if len(path) <= 34:
        return False
    return _HEX_RUN_RE.search(path) is not None


def is_url_blocked(url: EdgeUrl) -> bool:
    if url.domain.top_domain in BAD_TOP_DOMAINS:
        return True
    if "developer.mozilla.org" in url.path:
        return True
    if url.domain.top_domain == "github.com":
        return url.path.count("/") > 2

    path = url.path
    if ".git/" in path:
        return True
    if "wp-content/upload" in path:
        return True
    if "-download-free" in path:
        return True
    if hash_test(path):
        return True
    for guard, rx in _COMPILED:
        if guard in path and rx.search(path):
            return True
    return False


def is_mailing_list_link(url: EdgeUrl, block_mailing_lists: bool = False) -> bool:
    if not block_mailing_lists:
        return False
    p = url.path
    return (
        p.startswith("/lists/")
        or "mailinglist" in p
        or "mail-archive" in p
        or "mailman" in p
    )


def blocked_col(top_domain: Column, path: Column) -> Column:
    """Spark Column form of ``is_url_blocked`` — pure built-in expressions so
    Catalyst keeps the filter inside whole-stage codegen and can push it down.
    """
    farm = F.lit(False)
    for guard, rx in _LINK_FARM_PATTERNS:
        farm = farm | (path.contains(guard) & path.rlike(rx))

    return (
        top_domain.isin(*BAD_TOP_DOMAINS)
        | path.contains("developer.mozilla.org")
        | ((top_domain == "github.com") & (F.size(F.split(path, "/")) - 1 > 2))
        | path.contains(".git/")
        | path.contains("wp-content/upload")
        | path.contains("-download-free")
        | ((F.length(path) > 34) & path.rlike("[0-9a-f]{32}"))
        | farm
    )


def mailing_list_col(path: Column) -> Column:
    return (
        path.startswith("/lists/")
        | path.contains("mailinglist")
        | path.contains("mail-archive")
        | path.contains("mailman")
    )
