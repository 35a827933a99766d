"""Anchor-tags side input: external links pointing at a domain are
injected into its frontier at setup (oracle ↔ Spark equivalence)."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.oracle.crawler import OracleCrawler, info_from_web
from marginaliasearch_spark.oracle.session import DomainCrawlSession
from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42


def test_atags_feed_frontier(spark, tmp_path):
    web, _ = generate_web(seed=SEED, n_domains=6, mean_pages=10)
    # pick a crawled domain and an orphan-ish page as the atag target
    target_domain = None
    atag_urls = {}
    for d, spec in web.domains.items():
        if spec.probe == "ok":
            pages = [k for k in web._pages if k[0] == d and k[1] != "/"]
            if len(pages) > 4:
                target_domain = d
                atag_urls[d] = [web._pages[pages[2]].url, "https://other.com/x"]
                break
    assert target_domain

    # oracle with atags
    golden = {}
    for d in sorted(web.domains):
        info = info_from_web(web, d)
        sess = DomainCrawlSession(info, web, seed=SEED)
        phase = sess.setup(atag_urls=atag_urls.get(d))
        if phase == "active":
            phase = sess.run()
        cd, fl, vs = sess.drain()
        golden[d] = vs

    # spark with atags_df
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs = domains.select("domain", "crawl_depth", "seed_urls")
    atags_rows = [
        (d, i, u) for d, urls in atag_urls.items() for i, u in enumerate(urls)
    ]
    atags_df = spark.createDataFrame(atags_rows, "domain string, pos long, url string")

    engine = SparkCrawlEngine(spark, str(tmp_path / "atags"), seed=SEED, n_buckets=4)
    engine.init_run(domains, specs)
    engine.run_waves(pages, wave_budget=None, atags_df=atags_df)

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
        assert spark_visits.get(d, []) == g, d

    # the atag-injected URL must differ from a no-atags crawl for the target
    plain = OracleCrawler(web, seed=SEED).crawl_domain(target_domain)
    assert golden[target_domain] != plain.visited_order or set(
        golden[target_domain]
    ) != set(plain.visited_order)
