"""Link extraction/resolution semantics.

Reimplements the reference's ``LinkParser``
(ref: code/processes/crawling-process/ft-link-parser/java/nu/marginalia/
link_parser/LinkParser.java:19-256): href relevance gates, relative-URL
resolution (scheme-relative, absolute-path, directory-relative with %20
space repair), java-URI dot-segment normalization, and the ``/../``-prefix
renormalization quirk.
"""

from __future__ import annotations

import re
from typing import Optional

from .queryparams import query_params_sanitizer
from .url import (
    EdgeUrl,
    JavaURI,
    URISyntaxError,
    java_uri_strict,
    parse_uri_lenient,
    uri_normalize_path,
)

BLOCKED_SCHEMA_PREFIXES = ("mailto:", "javascript:", "tel:", "itpc:", "#", "file:")

BINARY_SUFFIXES = (
    ".pdf", ".mp3", ".wmv", ".avi", ".zip", ".7z",
    ".mpv", ".mp4", ".avi", ".mkv", ".tiff", ".dat", ".tar",
    ".com", ".bat", ".sh",
    ".bin", ".exe", ".tar.gz", ".tar.bz2", ".xml", ".swf",
    ".wav", ".ogg", ".jpg", ".jpeg", ".png", ".gif", ".webp",
    ".webm", ".bmp", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".gz", ".asc", ".md5", ".asf", ".mov", ".sig", ".pub", ".iso",
)

_META_REDIRECT_RE = re.compile(r"^\d+\s*;\s*url=(\S+)\s*$")
_WHITESPACE = {" ", "\r", "\n", "\t"}


def has_binary_suffix(s: str) -> bool:
    return s.endswith(BINARY_SUFFIXES)


def is_rel_relevant(rel: Optional[str]) -> bool:
    return rel is None or rel.lower() != "noindex"


def is_url_relevant(href: Optional[str]) -> bool:
    """Parse-time href gate (LinkParser.isUrlRelevant:215-232)."""
    if not href:
        return False
    if len(href) > 128:
        return False
    low = href.lower()
    if low.startswith(BLOCKED_SCHEMA_PREFIXES):
        return False
    if has_binary_suffix(low):
        return False
    return True


_WS_TABLE = str.maketrans("", "", " \r\n\t")


def clean_href(href: str) -> str:
    """Strip whitespace chars anywhere; drop #anchor (if not at index 0)."""
    url = href.translate(_WS_TABLE)
    anchor = url.find("#")
    if anchor > 0:
        return url[:anchor]
    return url


def _has_protocol(s: str) -> bool:
    i = 0
    while i < len(s) and s[i].isalpha():
        i += 1
    if i == 0 or i == len(s):
        return False
    return s[i] == ":"


def _relative_navigation(base: EdgeUrl) -> str:
    last_slash = base.path.rfind("/")
    if last_slash < 0:
        return "/"
    return base.path[: last_slash + 1]


def resolve_relative_url(base: EdgeUrl, s: str) -> str:
    """LinkParser.resolveRelativeUrl:154-182."""
    if _has_protocol(s):
        return s
    if s.startswith("//"):
        return base.proto + ":" + s

    parts = s.split("?", 1)
    path = parts[0]
    param = query_params_sanitizer(parts[0], parts[1]) if len(parts) > 1 else None

    if path.startswith("/"):
        return str(base.with_path_and_param(path, param))

    part_from_new_link = path.replace(" ", "%20")
    return str(base.with_path_and_param(_relative_navigation(base) + part_from_new_link, param))


def _renormalize(uri: JavaURI) -> JavaURI:
    """LinkParser.renormalize:125-139 — null path → '/' (the opaque-URI
    rewrite: ``new URI(scheme, host, "/", query, fragment)`` drops the
    opaque scheme-specific part), strip leading /../."""
    path = uri.raw_path
    if path is None:
        uri.raw_path = "/"
        uri.raw_query = None  # opaque URIs have no query component
        return uri
    if not path:
        uri.raw_path = "/"
        return uri
    while path.startswith("/../"):
        path = path[3:]
    uri.raw_path = path
    return uri


def _normalize_uri(uri: JavaURI) -> JavaURI:
    if uri.raw_path is not None:  # URI.normalize is identity on opaque URIs
        uri.raw_path = uri_normalize_path(uri.raw_path)
    return uri


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _parse_resolved(resolved: str) -> Optional[EdgeUrl]:
    """Parse+normalize a RESOLVED absolute URL string.  Pure and memoized:
    pages link to the same targets over and over (nav links), and the
    parse + normalize + EdgeUrl construction is the crawl loop's hottest
    path (profiled ~47% of session time).  EdgeUrl is immutable, so
    sharing instances is safe.

    STRICT parse (java_uri_strict), matching LinkParser.createURI's plain
    ``new URI(s)``:61-69 — no urlencode repair on this path (the lenient
    EdgeUriFactory pipeline is a different reference entry point, used
    for seed/spec URLs); a space or bad escape in an absolute href drops
    the link exactly like the reference, and opaque mailto:/javascript:
    URIs surviving the un-gated element paths become
    ``scheme://parse-error.invalid.example.com/`` like the reference."""
    try:
        uri = java_uri_strict(resolved)
    except (URISyntaxError, ValueError):
        return None
    uri = _renormalize(_normalize_uri(uri))
    try:
        return EdgeUrl.from_uri(uri)
    except (URISyntaxError, ValueError):
        return None


@lru_cache(maxsize=1 << 16)
def _parse_link_cached(
    proto: str, port, base: EdgeUrl, href: str
) -> Optional[EdgeUrl]:
    # proto and port ride the key explicitly: EdgeUrl equality ignores
    # them (EdgeUrl.java:161-188) but resolution must not — a
    # scheme-relative href resolves against the base's proto
    try:
        resolved = resolve_relative_url(base, href)
    except (URISyntaxError, ValueError):
        return None
    return _parse_resolved(resolved)


def parse_link(base: EdgeUrl, href: str) -> Optional[EdgeUrl]:
    """LinkParser.parseLink(baseUrl, String):81-88 — resolve + normalize.
    Memoized on (base, href): nav links repeat on every page of a
    domain, and resolution is the crawl loop's hottest path.

    The anchor-element form additionally applies ``is_url_relevant``/
    ``is_rel_relevant``/``clean_href`` first and rejects binary-suffix paths
    afterwards; use ``parse_link_from_anchor``.
    """
    return _parse_link_cached(base.proto, base.port, base, href)


def parse_link_from_anchor(
    base: EdgeUrl, href: str, rel: Optional[str] = None
) -> Optional[EdgeUrl]:
    """LinkParser.parseLink(baseUrl, Element):37-47 with gates applied."""
    if not is_url_relevant(href) or not is_rel_relevant(rel):
        return None
    url = parse_link(base, clean_href(href))
    if url is None or has_binary_suffix(url.path):
        return None
    return url


def parse_meta_redirect(base: EdgeUrl, content: str) -> Optional[EdgeUrl]:
    m = _META_REDIRECT_RE.match(content)
    if not m:
        return None
    return parse_link(base, m.group(1))


def get_base_link(base_hrefs: list[str], document_url: EdgeUrl) -> EdgeUrl:
    """LinkParser.getBaseLink:238-254 over pre-extracted <base href> values."""
    try:
        for href in base_hrefs:
            if href:
                url = parse_uri_lenient(resolve_relative_url(document_url, href))
                return EdgeUrl.from_uri(url)
    except (URISyntaxError, ValueError):
        pass
    return document_url
