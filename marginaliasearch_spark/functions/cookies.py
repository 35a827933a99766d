"""Per-domain cookie jar (DomainCookies port).

Reimplements the reference's crawl-session cookie model (ref:
code/processes/crawling-process/java/nu/marginalia/crawl/fetcher/
DomainCookies.java:12-66): one jar per domain crawl; every response's
``Set-Cookie`` headers update it (name = value from the first
``;``-separated part, both trimmed; valueless cookies store ""); the
jar's non-emptiness is the ``X-Has-Cookies`` WARC marker
(WarcRecorder.java:140-141, 321-322) which becomes the Slop ``cookies``
byte column at rest (SlopCrawlDataRecord.java:48,308).  The jar updates
BEFORE the record is written, so the response that sets the first cookie
is itself marked.

Cookies never affect crawl ordering or the seen-set — the jar exists for
at-rest schema parity and (in a live deployment) request painting."""

from __future__ import annotations

from typing import Iterable, Optional


class DomainCookies:
    """Insertion-ordered name→value jar (the reference uses a HashMap —
    iteration order only affects the painted Cookie header, never the
    has-cookies marker)."""

    __slots__ = ("cookies",)

    def __init__(self, cookies: Optional[dict] = None) -> None:
        self.cookies: dict[str, str] = dict(cookies or {})

    def has_cookies(self) -> bool:
        return bool(self.cookies)

    def update_from_set_cookie(self, values: Iterable[str]) -> None:
        """DomainCookies.updateCookieStore over the response's Set-Cookie
        header values."""
        for value in values:
            if value:
                self._parse_cookie_header(value)

    def _parse_cookie_header(self, value: str) -> None:
        # DomainCookies.parseCookieHeader:28-46: first ';' part only
        # (attributes like Path/Expires dropped), split on the first '=' ,
        # trim both sides; a bare token without '=' is NOT stored
        cookie = value.split(";")[0].strip()
        if "=" not in cookie:
            return
        name, _, val = cookie.partition("=")
        self.cookies[name.strip()] = val.strip()

    def cookie_header(self) -> str:
        """DomainCookies.createCookieHeader — the painted Cookie value."""
        return "; ".join(f"{k}={v}" for k, v in self.cookies.items())


__all__ = ["DomainCookies"]
