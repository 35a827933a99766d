"""Recrawl/revisit round-2 semantics (CrawlerRevisitor): replaying the
prior crawl with ETag retention, 404 memoization, adaptive skip sampling
(seeded), then BFS discovery — oracle vs Spark engine equivalence."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.oracle import OracleCrawler
from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42


@pytest.fixture(scope="module")
def web():
    w, _ = generate_web(seed=SEED, n_domains=8, mean_pages=12)
    return w


@pytest.fixture(scope="module")
def round1(web):
    oracle = OracleCrawler(web, seed=SEED)
    return {d: oracle.crawl_domain(d) for d in sorted(web.domains)}


def test_oracle_recrawl_replays_prior(web, round1):
    oracle = OracleCrawler(web, seed=SEED)
    for d, r1 in round1.items():
        if r1.result != "crawled" or not r1.crawl_data:
            continue
        r2 = oracle.crawl_domain(d, prev_crawl=r1.crawl_data)
        assert r2.recrawl_size >= 0
        # prior URLs come back before BFS discovery; the seen set can only grow
        assert set(h for h, v in r1.seen_hashes.items() if v) <= set(
            h for h, v in r2.seen_hashes.items() if v
        ) or r2.recrawl_size == 0


def test_spark_recrawl_matches_oracle(spark, web, round1, tmp_path_factory):
    oracle = OracleCrawler(web, seed=SEED)
    golden = {
        d: oracle.crawl_domain(d, prev_crawl=(r1.crawl_data or None))
        for d, r1 in round1.items()
    }

    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs = domains.select("domain", "crawl_depth", "seed_urls")

    prev_rows = []
    for d, r1 in round1.items():
        for i, rec in enumerate(r1.crawl_data):
            prev_rows.append(
                (d, i, rec["url"], rec["http_status"], rec["image_id"], rec["etag"])
            )
    prev_df = spark.createDataFrame(
        prev_rows,
        "domain string, pos long, url string, http_status int, image_id string, etag string",
    )

    out = str(tmp_path_factory.mktemp("recrawl"))
    engine = SparkCrawlEngine(spark, out, seed=SEED, n_buckets=8)
    engine.init_run(domains, specs)
    engine.run_waves(pages, wave_budget=None, prev_crawl_df=prev_df)

    visits = (
        engine.read_table("visits")
        .groupBy("domain")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("wave", "idx", "url"))),
                lambda s: s["url"],
            ).alias("urls")
        )
        .collect()
    )
    spark_visits = {r["domain"]: list(r["urls"]) for r in visits}
    for d, g in golden.items():
        assert spark_visits.get(d, []) == g.visited_order, f"recrawl visit order {d}"

    fr = engine.read_table("frontier").collect()
    spark_seen: dict = {}
    for r in fr:
        if r["state"] in ("VISITED", "KNOWN"):
            spark_seen.setdefault(r["domain"], {})[r["url_hash"]] = r["state"] == "VISITED"
    for d, g in golden.items():
        if g.result == "crawled":
            assert spark_seen.get(d, {}) == g.seen_hashes, f"recrawl seen-set {d}"
