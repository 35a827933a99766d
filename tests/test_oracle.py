"""Oracle-crawler behavior tests over the synthetic web: determinism,
gate behavior (robots refusals, blocklist, link filters, dedup), depth caps,
priority-front redirects, sitemap injection, error budget."""

import pytest

from marginaliasearch_spark.canon import EdgeUrl
from marginaliasearch_spark.canon.murmur import hash_url_parts
from marginaliasearch_spark.oracle import OracleCrawler
from marginaliasearch_spark.oracle.frontier import DomainFrontier
from marginaliasearch_spark.canon.domain import EdgeDomain
from marginaliasearch_spark.sources.synthetic_web import generate_web


@pytest.fixture(scope="module")
def web():
    w, _ = generate_web(seed=42, n_domains=12, mean_pages=25)
    return w


def test_web_determinism():
    w1, n1 = generate_web(seed=42, n_domains=6, mean_pages=10)
    w2, n2 = generate_web(seed=42, n_domains=6, mean_pages=10)
    assert n1 == n2
    assert sorted(w1.domains) == sorted(w2.domains)
    p1 = {k: (p.status, tuple(p.links)) for k, p in w1._pages.items()}
    p2 = {k: (p.status, tuple(p.links)) for k, p in w2._pages.items()}
    assert p1 == p2
    w3, _ = generate_web(seed=43, n_domains=6, mean_pages=10)
    p3 = {k: (p.status, tuple(p.links)) for k, p in w3._pages.items()}
    assert p1 != p3


def test_oracle_determinism(web):
    oc = OracleCrawler(web, seed=42)
    doms = sorted(web.domains)
    r1 = [oc.crawl_domain(d) for d in doms]
    r2 = [OracleCrawler(web, seed=42).crawl_domain(d) for d in doms]
    for a, b in zip(r1, r2):
        assert a.visited_order == b.visited_order
        assert a.seen_hashes == b.seen_hashes
        assert a.virtual_ms == b.virtual_ms


def test_oracle_crawls_something(web):
    oc = OracleCrawler(web, seed=42)
    total_visited = 0
    results = {}
    for d in sorted(web.domains):
        r = oc.crawl_domain(d)
        results[d] = r
        if r.result == "crawled":
            assert r.visited_order, f"{d} crawled nothing"
            # root is always visited first
            root = r.visited_order[0]
            assert EdgeUrl.from_string(root).path == "/"
            total_visited += len(r.visited_order)
    assert total_visited > 50
    assert any(r.result != "crawled" for r in results.values())  # probe failures exist


def test_visited_set_consistency(web):
    """Every visited URL's hash is in seen_hashes with visited=True."""
    oc = OracleCrawler(web, seed=42)
    for d in sorted(web.domains)[:6]:
        r = oc.crawl_domain(d)
        for u in r.visited_order:
            url = EdgeUrl.from_string(u)
            h = hash_url_parts(url.domain.address, url.path, url.param)
            assert r.seen_hashes.get(h) is True, (d, u)


def test_depth_cap(web):
    oc = OracleCrawler(web, seed=42)
    d = sorted(web.domains)[0]
    r = oc.crawl_domain(d, crawl_depth=5)
    # visitedCnt >= depth stops the loop; sniff marks root too
    assert len(r.visited_order) <= 6


def test_no_cross_domain_visits(web):
    oc = OracleCrawler(web, seed=42)
    for d in sorted(web.domains)[:8]:
        r = oc.crawl_domain(d)
        for u in r.visited_order:
            assert EdgeUrl.from_string(u).domain.address == d


def test_no_blocked_or_filtered_visits(web):
    from marginaliasearch_spark.operators.blocklist import is_url_blocked

    oc = OracleCrawler(web, seed=42)
    for d in sorted(web.domains):
        r = oc.crawl_domain(d)
        for u in r.visited_order:
            assert not is_url_blocked(EdgeUrl.from_string(u)), (d, u)


def test_robots_disallow_respected(web):
    """Domains with 'Disallow: /private/' never visit /private/ paths."""
    oc = OracleCrawler(web, seed=42)
    for d, spec in web.domains.items():
        if spec.robots_txt and "Disallow: /private/" in spec.robots_txt:
            r = oc.crawl_domain(d)
            for u in r.visited_order:
                # prefix rule: only paths *starting* with /private/ are refused
                assert EdgeUrl.from_string(u).path.startswith("/private/") is False, (d, u)


def test_frontier_trailing_slash_identity():
    # DomainCrawlFrontierTest semantics
    f = DomainFrontier(EdgeDomain("example.com"), [], 100)
    u1 = EdgeUrl.from_string("https://example.com")
    u2 = EdgeUrl.from_string("https://example.com/")
    assert f.add_visited(u1)
    assert not f.add_visited(u2)
    assert f.is_visited(u2)


def test_frontier_schema_rewrite():
    f = DomainFrontier(EdgeDomain("example.com"), [], 100)
    f.supports_https = True
    f.add_to_queue(EdgeUrl.from_string("http://example.com/page"))
    assert f.queue[0].startswith("https://")
    f2 = DomainFrontier(EdgeDomain("example.com"), [], 100)
    f2.supports_https = False
    f2.add_to_queue(EdgeUrl.from_string("https://example.com/page"))
    assert f2.queue[0].startswith("http://")


def test_frontier_size_cap():
    f = DomainFrontier(EdgeDomain("example.com"), [], depth=5)
    for i in range(10_020):
        f.add_to_queue(EdgeUrl.from_string(f"https://example.com/p{i}"))
    assert len(f.queue) <= 5 + 10_000
