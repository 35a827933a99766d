"""Single-threaded oracle crawler — the golden model for correctness.

Implements the reference's per-domain crawl semantics directly (gate order,
frontier FIFO discipline, politeness virtual clock, revisit logic) so the
distributed Spark pipeline can be asserted equal on crawl order and URL-seen
set, mirroring how the reference's mock-fetcher test drives CrawlerRetreiver.
"""

from .crawler import OracleCrawler, DomainCrawlResult

__all__ = ["OracleCrawler", "DomainCrawlResult"]
