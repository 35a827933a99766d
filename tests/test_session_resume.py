"""Session checkpointing: a crawl broken into budgeted waves with full
serialize/rehydrate at every boundary must equal a single uninterrupted run
(crawl order, seen set, virtual clock) — the invariant Iceberg-style wave
checkpointing relies on."""

import pytest

from marginaliasearch_spark.oracle import OracleCrawler
from marginaliasearch_spark.oracle.crawler import info_from_web
from marginaliasearch_spark.oracle.session import DomainCrawlSession
from marginaliasearch_spark.sources.synthetic_web import generate_web


@pytest.fixture(scope="module")
def web():
    w, _ = generate_web(seed=42, n_domains=12, mean_pages=25)
    return w


@pytest.mark.parametrize("budget", [1, 3, 7])
def test_wave_resume_equals_straight_run(web, budget):
    oracle = OracleCrawler(web, seed=42)
    for domain in sorted(web.domains):
        golden = oracle.crawl_domain(domain)

        info = info_from_web(web, domain)
        sess = DomainCrawlSession(info, web, seed=42)
        phase = sess.setup()
        visits, data, log = [], [], []

        def collect(s):
            cd, fl, vs = s.drain()
            data.extend(cd)
            log.extend(fl)
            visits.extend(vs)

        collect(sess)
        waves = 0
        while phase == "active":
            # full serialize → rehydrate at every wave boundary
            sj = sess.state_json()
            rows = sess.frontier_rows()
            sess = DomainCrawlSession.rehydrate(info, web, sj, rows, seed=42)
            phase = sess.run(max_fetches=budget)
            collect(sess)
            waves += 1
            assert waves < 10_000

        result_name = {"done": "crawled"}.get(phase, phase)
        assert result_name == golden.result, domain
        assert visits == golden.visited_order, domain
        assert dict(sess.frontier.visited) == golden.seen_hashes, domain
        assert data == golden.crawl_data, domain
        assert sess.timer.clock_ms == golden.virtual_ms, domain
