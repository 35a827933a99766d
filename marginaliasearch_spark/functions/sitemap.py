"""Sitemap / feed XML parsing with the reference's caps.

Reimplements the recursive sitemap walk semantics (ref: code/processes/
crawling-process/java/nu/marginalia/crawl/fetcher/HttpFetcherImpl.java:
491-618): handles ``urlset`` / ``sitemapindex`` / ``rss`` / ``atom``
roots, same-domain filtering, local dedup, and the ≤10-sitemap-fetch /
≤20,000-URL caps.  Uses stdlib ElementTree (lxml is not in this image);
exposed as a plain function for the fetch-wave UDFs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable, Optional

MAX_SITEMAP_FETCHES = 10
MAX_SITEMAP_URLS = 20_000


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_xml(content: str) -> tuple[str, list[str]]:
    """→ (kind, urls): kind ∈ {urlset, sitemapindex, rss, atom, error}.
    For sitemapindex the urls are *sitemap* references, not page URLs."""
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return "error", []
    kind = _local(root.tag)
    urls: list[str] = []
    if kind == "urlset":
        for url_el in root:
            if _local(url_el.tag) != "url":
                continue
            for loc in url_el:
                if _local(loc.tag) == "loc" and loc.text:
                    urls.append(loc.text.strip())
    elif kind == "sitemapindex":
        for sm in root:
            if _local(sm.tag) != "sitemap":
                continue
            for loc in sm:
                if _local(loc.tag) == "loc" and loc.text:
                    urls.append(loc.text.strip())
    elif kind == "rss":
        for channel in root:
            for item in channel:
                if _local(item.tag) != "item":
                    continue
                for el in item:
                    if _local(el.tag) == "link" and el.text:
                        urls.append(el.text.strip())
        kind = "rss"
    elif kind == "feed":  # atom
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            for el in entry:
                if _local(el.tag) == "link":
                    href = el.get("href")
                    if href:
                        urls.append(href.strip())
        kind = "atom"
    else:
        return "error", []
    return kind, urls


def walk_sitemaps(
    start_url: str,
    fetch: Callable[[str], Optional[str]],
    max_fetches: int = MAX_SITEMAP_FETCHES,
    max_urls: int = MAX_SITEMAP_URLS,
    same_domain: Optional[Callable[[str], bool]] = None,
) -> list[str]:
    """Recursive sitemap walk, faithful to the reference's traversal
    (HttpFetcherImpl.java:489-542):

    - ``++fetchedSitemaps < 10`` is a pre-increment check — at most
      ``max_fetches - 1`` (9) sitemaps are ever fetched;
    - nested ``sitemapindex`` refs are deduped at ENQUEUE time and pushed
      with ``addFirst`` — each ref list is processed LIFO, i.e. in
      reverse listing order, before anything already queued;
    - the root is never marked seen (a nested ref back to it re-enqueues);
    - seen-URL dedup happens on the raw string BEFORE the same-domain
      filter (an off-domain duplicate still poisons the seen-set);
    - the ``max_urls`` cap is only checked between fetches — a single
      urlset can overshoot it, exactly like the reference's
      ``ret.size() < 20_000`` loop-top check.

    ``fetch(url) → xml text or None`` is supplied by the caller (the
    synthetic web in tests, HTTP in production); a ``None`` (fetch error)
    still consumes fetch budget, as the reference's SitemapError does.
    ``same_domain`` filters both page URLs and nested sitemap refs
    (ref: ``u.domain.equals(rootSitemapUrl.domain)``); off-domain refs
    are never enqueued so they consume no budget.
    """
    seen_sitemaps: set[str] = set()
    seen_urls: set[str] = set()
    out: list[str] = []
    queue: list[str] = [start_url]
    fetches = 0
    while queue and len(out) < max_urls:
        fetches += 1
        if fetches >= max_fetches:
            break
        sm = queue.pop(0)
        content = fetch(sm)
        if content is None:
            continue
        kind, urls = parse_sitemap_xml(content)
        if kind == "sitemapindex":
            new_refs = []
            for ref in urls:
                if ref not in seen_sitemaps:
                    seen_sitemaps.add(ref)
                    if same_domain is None or same_domain(ref):
                        new_refs.append(ref)
            # sequential addFirst ⇒ the last-listed ref is dequeued first
            queue[:0] = reversed(new_refs)
        elif kind in ("urlset", "rss", "atom"):
            for u in urls:
                if u not in seen_urls:
                    seen_urls.add(u)
                    if same_domain is None or same_domain(u):
                        out.append(u)
    return out
