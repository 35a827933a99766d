"""ContentTypeLogic — which URLs get a HEAD probe and which content
types are fetchable.

Reimplements the reference's ContentTypeLogic (ref: code/processes/
crawling-process/model/java/nu/marginalia/model/body/
ContentTypeLogic.java:13-59):

- ``is_url_like_binary``: lowercase path; NOT binary when it ends in
  .htm/.html/.php/.txt/.md/.pdf (the probable-good pattern), binary-like
  when it ends in any other ``.[a-z]+`` extension;
- ``is_allowable_content_type``: text/css and text/javascript are
  blocked outright; otherwise any of the accepted prefixes passes.

The probe flow itself (HEAD before GET for binary-looking URLs, 405 →
proceed, redirect → ResultRedirect, out-of-range status → error) lives
in the session (`oracle/session.py::_content_type_probe`), mirroring
HttpFetcherImpl.probeContentType (:332-400) and its arm handling in
fetchContent (:408-446).
"""

from __future__ import annotations

import re

_PROBABLE_GOOD = re.compile(r".*\.(htm|html|php|txt|md|pdf)")
_PROBABLE_BINARY = re.compile(r".*\.[a-z]+")

BLOCKED_CONTENT_TYPES = frozenset({"text/css", "text/javascript"})
ACCEPTED_CONTENT_TYPE_PREFIXES = (
    "text/",
    "application/xhtml",
    "application/xml",
    "application/atom+xml",
    "application/atomsvc+xml",
    "application/rss+xml",
    "application/x-rss+xml",
    "application/rdf+xml",
    "application/pdf",
    "x-rss+xml",
)


def is_url_like_binary(path: str) -> bool:
    """True when the URL path looks like a binary file (probe the content
    type with HEAD before spending a GET on it)."""
    # fullmatch mirrors Java's Pattern.asMatchPredicate() whole-string
    # semantics: a trailing '\n' (which Python's $ would tolerate under
    # .match()) must NOT classify like the bare path.
    p = path.lower()
    if _PROBABLE_GOOD.fullmatch(p):
        return False
    return bool(_PROBABLE_BINARY.fullmatch(p))


def is_allowable_content_type(content_type: str) -> bool:
    if content_type in BLOCKED_CONTENT_TYPES:
        return False
    return any(content_type.startswith(p) for p in ACCEPTED_CONTENT_TYPE_PREFIXES)
