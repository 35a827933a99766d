"""Single-threaded oracle crawler over the synthetic web.

Implements the reference's per-domain crawl lifecycle
(ref: code/processes/crawling-process/java/nu/marginalia/crawl/retreival/
CrawlerRetreiver.java:95-523):

  probe root → 1 s sleep → robots → root-allowed gate → root sniff
  (link filter selection, link enqueue, favicon, feed discovery)
  → [recrawl replay] → sitemap enqueue → BFS loop with the fetch-time gate
  sequence (robots → link filter → blocklist → proto → length → addVisited).

Determinism contract (SURVEY §7.5): the reference's Math.random()/jitter
sites are replaced with a seeded RNG / zero jitter under the virtual clock;
wall time is simulated (CrawlDelayTimer semantics with deterministic
per-URL fetch durations), so crawl order, seen set and the virtual-time
politeness schedule are all reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..canon.domain import EdgeDomain
from ..canon.linkparser import get_base_link, parse_link, parse_link_from_anchor
from ..canon.url import EdgeUrl, parse_url
from ..functions.robots import RobotRules, parse_robots_txt
from ..operators.blocklist import is_url_blocked
from ..operators.linkfilter import select_filter_kind
from ..sources.synthetic_web import Page, SyntheticWeb, fetch_time_ms
from .frontier import DomainFrontier

MAX_ERRORS = 20
USER_AGENT = "search.marginalia.nu"
DEFAULT_DELAY_MIN_MS = 1000
DEFAULT_DELAY_MAX_MS = 2500

LIKELY_FEED_ENDPOINTS = [
    "rss.xml", "atom.xml", "feed.xml", "index.xml", "feed",
    "rss", "atom", "feeds", "blog/feed", "blog/rss",
]


@dataclass
class DomainCrawlResult:
    domain: str
    result: str  # crawled | blocked | redirect | error
    visited_order: list[str] = field(default_factory=list)
    seen_hashes: dict = field(default_factory=dict)  # url_hash → visited bool
    crawl_data: list[dict] = field(default_factory=list)
    fetch_log: list[dict] = field(default_factory=list)
    virtual_ms: int = 0
    error_count: int = 0
    crawler_additions: int = 0
    recrawl_size: int = 0


class _Timer:
    """CrawlDelayTimer with a virtual clock and zero jitter."""

    def __init__(self, crawl_delay_ms: int):
        self.delay_ms = crawl_delay_ms if crawl_delay_ms > 0 else DEFAULT_DELAY_MIN_MS
        self.explicit = crawl_delay_ms > 0
        self.slow_down = False
        self.clock_ms = 0

    def sleep(self, ms: int) -> None:
        self.clock_ms += ms

    def wait_fetch_delay(self, spent_ms: int = 0) -> None:
        if self.explicit:
            if spent_ms <= self.delay_ms:
                self.sleep(min(self.delay_ms - spent_ms, 5000))
        else:
            sleep_time = min(max(spent_ms * 2, DEFAULT_DELAY_MIN_MS), DEFAULT_DELAY_MAX_MS)
            if spent_ms <= sleep_time:
                self.sleep(sleep_time - spent_ms)
        if self.slow_down:
            self.sleep(DEFAULT_DELAY_MIN_MS)


class OracleCrawler:
    def __init__(self, web: SyntheticWeb, seed: int = 42):
        self.web = web
        self.seed = seed

    # ------------------------------------------------------------------

    def crawl_domain(
        self,
        domain: str,
        crawl_depth: Optional[int] = None,
        seed_urls: Optional[list[str]] = None,
        prev_crawl: Optional[list[dict]] = None,
    ) -> DomainCrawlResult:
        spec = self.web.domains.get(domain)
        res = DomainCrawlResult(domain=domain, result="error")

        edge_domain = EdgeDomain(domain)
        depth = crawl_depth if crawl_depth is not None else (spec.crawl_depth if spec else 1000)
        seeds = seed_urls if seed_urls is not None else (spec.seed_urls if spec else [])

        frontier = DomainFrontier(edge_domain, seeds, depth)
        # force the index page to the queue head (CrawlerRetreiver ctor :80-87)
        fst = frontier.peek()
        if fst is not None:
            frontier.add_first(fst.with_path_and_param("/", None))

        timer_holder: list[_Timer] = []
        error_count = 0

        def log(url: str, action: str, status: int = 0) -> None:
            res.fetch_log.append(
                {
                    "url": url,
                    "action": action,
                    "status": status,
                    "virtual_ms": timer_holder[0].clock_ms if timer_holder else 0,
                }
            )

        # --- probe ------------------------------------------------------
        if spec is None or spec.probe == "error":
            res.result = "error"
            return res
        if spec.probe.startswith("redirect:"):
            res.result = "redirect"
            return res

        probed = EdgeUrl(spec.proto, edge_domain, None, "/", None)
        frontier.supports_https = probed.proto == "https"

        timer0_ms = 1000  # post-probe sleep (CrawlerRetreiver:116)

        # --- robots -------------------------------------------------------
        rules = parse_robots_txt(spec.robots_txt, USER_AGENT)
        timer = _Timer(rules.crawl_delay_ms)
        timer_holder.append(timer)
        timer.sleep(timer0_ms)

        if not rules.is_allowed(str(probed)):
            log(str(probed), "REFUSED_ROBOTS")
            res.result = "blocked"
            return res
        timer.wait_fetch_delay(0)

        # --- sniff root document (CrawlerRetreiver:296-398) ----------------
        root_url = probed.with_path_and_param("/", None)
        page = self._fetch(root_url, timer)
        log(str(root_url), "FETCH_SNIFF", page.status)
        timer.wait_fetch_delay(0)

        if page.status in (301, 302, 307) and page.redirect_to:
            loc = parse_link(root_url, page.redirect_to)
            if loc is not None and loc.domain == edge_domain:
                frontier.add_first(loc)
        elif page.status == 200 and page.content_type == "text/html":
            frontier.link_filter_kind = select_filter_kind(
                edge_domain.top_domain, spec.generator_meta, spec.has_lemmy_config
            )
            self._enqueue_links(frontier, root_url, page)
            self._record_crawl_data(res, page, root_url)

            # favicon + feed discovery (affect virtual clock + fetch log only)
            feed = self._discover_feed(root_url, page, rules, timer, log)
            favicon_url = root_url.with_path_and_param("/favicon.ico", None)
            if rules.is_allowed(str(favicon_url)):
                fav = self._fetch(favicon_url, timer)
                log(str(favicon_url), "FETCH_FAVICON", fav.status)
            timer.wait_fetch_delay(0)
            _ = feed
        frontier.add_visited(root_url)
        res.visited_order.append(str(root_url))

        # --- recrawl replay (CrawlerRevisitor:45-184) -----------------------
        recrawl_size = 0
        if prev_crawl:
            recrawl_size, rc_errors = self._recrawl(
                frontier, prev_crawl, rules, timer, res, log
            )
            error_count += rc_errors
            if recrawl_size > 0:
                frontier.increase_depth(1.5, 2500)
        res.recrawl_size = recrawl_size

        # --- sitemaps from robots (CrawlerRetreiver:199-207) ----------------
        for sm in rules.sitemaps:
            sm_url = parse_url(sm)
            if sm_url is not None and sm_url.domain == edge_domain:
                sm_page = self.web.page_at(sm_url.with_proto(spec.proto))
                if sm_page is not None:
                    log(str(sm_url), "FETCH_SITEMAP", sm_page.status)
                    urls = []
                    for u in (spec.sitemap_urls or [])[:20_000]:
                        pu = parse_url(u)
                        if pu is not None:
                            urls.append(pu)
                    frontier.add_all(urls)

        # --- BFS loop (CrawlerRetreiver:212-253) -----------------------------
        while (
            not frontier.is_empty()
            and not frontier.is_crawl_depth_reached()
            and error_count < MAX_ERRORS
        ):
            top = frontier.take_next()

            if not rules.is_allowed(str(top)):
                log(str(top), "REFUSED_ROBOTS")
                continue
            if not frontier.filter_link(top):
                continue
            if is_url_blocked(top):
                continue
            if top.proto not in ("http", "https"):
                continue
            if len(str(top)) > 255:
                continue
            if not frontier.add_visited(top):
                continue

            page = self._fetch(top, timer)
            spent = fetch_time_ms(str(top))
            log(str(top), "FETCH", page.status)
            res.visited_order.append(str(top))
            timer.wait_fetch_delay(spent)

            if page.status == 200:
                res.crawler_additions += 1
                if page.content_type == "text/html":
                    self._enqueue_links(frontier, top, page)
                    frontier.add_visited(top)
                self._record_crawl_data(res, page, top)
            elif page.status in (301, 302, 307) and page.redirect_to:
                loc = parse_link(top, page.redirect_to)
                if loc is not None and loc.domain == edge_domain:
                    frontier.add_first(loc)
            elif page.status in (429, -1):
                if page.status == 429:
                    timer.slow_down = True
                    timer.sleep(1000)  # waitRetryDelay clamp low end
                error_count += 1
            # 404/500: no body, no error count (not an exception)

        res.result = "crawled"
        res.seen_hashes = dict(frontier.visited)
        res.virtual_ms = timer.clock_ms
        res.error_count = error_count
        return res

    # ------------------------------------------------------------------

    def _fetch(self, url: EdgeUrl, timer: _Timer) -> Page:
        page = self.web.fetch(url)
        timer.sleep(fetch_time_ms(str(url)))
        return page

    def _enqueue_links(self, frontier: DomainFrontier, base_url: EdgeUrl, page: Page) -> None:
        base = get_base_link([page.base_href] if page.base_href else [], base_url)
        for href in page.links:
            url = parse_link_from_anchor(base, href)
            if url is not None:
                frontier.add_to_queue(url)

    def _record_crawl_data(self, res: DomainCrawlResult, page: Page, url: EdgeUrl) -> None:
        res.crawl_data.append(
            {
                "domain": page.domain,
                "url": str(url),
                "http_status": page.status,
                "content_type": page.content_type,
                "image_id": page.image_id,
                "etag": page.etag,
                "last_modified": page.last_modified,
            }
        )

    def _discover_feed(self, root_url, page, rules, timer, log) -> Optional[str]:
        for href in page.feed_links:
            url = parse_link(root_url, href)
            if url is not None and url.domain == root_url.domain:
                return str(url)
        # guess likely endpoints (CrawlerRetreiver:413-435)
        for endpoint in LIKELY_FEED_ENDPOINTS:
            url = root_url.with_path_and_param(endpoint, None)
            if not rules.is_allowed(str(url)):
                continue
            p = self._fetch(url, timer)
            log(str(url), "FETCH_FEEDGUESS", p.status)
            timer.wait_fetch_delay(0)
            if p.status == 200 and p.body_marker:
                head = p.body_marker[:128].lower()
                if "<atom" in head or "<rss" in head:
                    return str(url)
        return None

    # --- recrawl (CrawlerRevisitor.recrawl) -------------------------------

    def _recrawl(self, frontier, prev_crawl, rules, timer, res, log):
        rng = np.random.default_rng([self.seed, 555])
        recrawled = 0
        retained = 0
        errors = 0
        skipped = 0
        size = 0

        strategy = (
            "SUMMARY"
            if frontier.domain.top_domain in ("substack.com", "blogspot.com", "wordpress.com")
            else "FULL"
        )
        if strategy == "SUMMARY" and rng.random() > 0.9:
            strategy = "FULL"

        for doc in prev_crawl:
            if errors > 20:
                break
            url = parse_url(doc["url"])
            if url is None:
                continue
            if doc["http_status"] == 404:
                frontier.add_visited(url)
                continue
            if doc["http_status"] not in (200, 206):
                continue
            if not doc.get("image_id"):  # hasBody analogue
                continue
            if not frontier.has_correct_schema(url):
                continue
            if not frontier.filter_link(url):
                continue
            if not frontier.add_visited(url):
                continue
            if not rules.is_allowed(str(url)):
                log(str(url), "REFUSED_ROBOTS")
                continue
            size += 1

            if strategy == "SUMMARY" and recrawled >= 5 and retained > 0.8 * recrawled:
                skip_prob = 1.0
            else:
                skip_prob = (retained / recrawled) if recrawled else 0.0
                if skipped + recrawled > 10_000:
                    skip_prob = min(max(skip_prob, 0.75), 0.99)
                elif skipped + recrawled > 1000:
                    skip_prob = min(max(skip_prob, 0.5), 0.75)
                elif recrawled > 25:
                    skip_prob = min(max(skip_prob, 0.0), 0.50)
                else:
                    skip_prob = 0.0

            if rng.random() < skip_prob:
                # reuse stored copy; harvest links from it
                page = self.web.page_at(url)
                if page is not None and page.links:
                    self._enqueue_links(frontier, url, page)
                res.visited_order.append(str(url))
                log(str(url), "REFERENCE_COPY", doc["http_status"])
                skipped += 1
            else:
                page = self._fetch(url, timer)
                spent = fetch_time_ms(str(url))
                log(str(url), "FETCH_RECRAWL", page.status)
                res.visited_order.append(str(url))
                timer.wait_fetch_delay(spent)

                is_same = (
                    page.status == 200
                    and doc.get("etag") is not None
                    and page.etag == doc.get("etag")
                )
                if page.status == 200 and page.content_type == "text/html":
                    self._enqueue_links(frontier, url, page)
                    frontier.add_visited(url)
                    self._record_crawl_data(res, page, url)
                    res.crawler_additions += 0
                if is_same:
                    retained += 1
                elif page.status in (429, -1):
                    errors += 1
                recrawled += 1
        return size, errors
