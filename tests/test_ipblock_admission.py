"""IP/Geo blocklist wired into domain admission (IpBlockList.java:61-93,
GeoIpBlocklist.java:19-42): planted blocked domains are recorded as
phase='blocked_ip' at spec load and never crawled."""

import pandas as pd
import pyspark.sql.functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    normalize_pages_pdf,
    spark_schemas,
)


def _mini_web(spark, domains):
    rows = []
    drows = []
    for d in domains:
        drows.append(
            {
                "domain": d, "top_domain": ".".join(d.split(".")[-2:]),
                "proto": "https", "probe": "ok", "robots_txt": None,
                "site_kind": "default", "crawl_depth": 100, "seed_urls": [],
                "sitemap_urls": [], "generator_meta": "", "has_lemmy_config": False,
            }
        )
        rows.append(
            {
                "domain": d, "path": "/", "param": None, "url": f"https://{d}/",
                "status": 200, "redirect_to": None, "content_type": "text/html",
                "image_id": None, "base_href": None, "links": ["/a.html"],
                "feed_links": [], "body_marker": None, "etag": None,
                "last_modified": None, "body_text": None,
            }
        )
        rows.append(
            {
                "domain": d, "path": "/a.html", "param": None,
                "url": f"https://{d}/a.html", "status": 200, "redirect_to": None,
                "content_type": "text/html", "image_id": None, "base_href": None,
                "links": [], "feed_links": [], "body_marker": None, "etag": None,
                "last_modified": None, "body_text": None,
            }
        )
    ps, ds = spark_schemas()
    return (
        spark.createDataFrame(normalize_pages_pdf(pd.DataFrame(rows)), schema=ps),
        spark.createDataFrame(pd.DataFrame(drows), schema=ds),
    )


def test_planted_blocked_domains_never_crawled(spark, tmp_path):
    domains = [
        "ok.example.com",          # admitted
        "shop.example.cn",         # .cn TLD → blocked
        "farm1234.example.com",    # 4-digit run → blocked
        "cdn.blocked-range.net",   # CIDR hit (planted ip) → blocked
        "sub.graylist.example",    # graylisted country, non-www sub → blocked
        "www.graylist.example",    # graylisted country, www → admitted
    ]
    pages, doms = _mini_web(spark, domains)
    specs = doms.select("domain", "crawl_depth", "seed_urls")

    ip_facts = spark.createDataFrame(
        [
            ("ok.example.com", 167772161, "US"),
            ("shop.example.cn", 167772162, "CN"),
            ("farm1234.example.com", 167772163, "US"),
            ("cdn.blocked-range.net", (10 << 24) | (9 << 16) | 5, "US"),
            ("sub.graylist.example", 167772165, "RU"),
            ("www.graylist.example", 167772166, "RU"),
        ],
        "domain string, ip_int long, country string",
    )
    # block 10.9.0.0/16
    cidr = spark.createDataFrame(
        [((10 << 24) | (9 << 16), (10 << 24) | (9 << 16) | 0xFFFF)],
        "range_lo long, range_hi long",
    )

    eng = SparkCrawlEngine(spark, str(tmp_path / "ipb"), seed=42, n_buckets=4)
    eng.init_run(doms, specs, ip_facts_df=ip_facts, cidr_df=cidr)
    eng.run_waves(pages, wave_budget=None)

    phases = {r["domain"]: r["phase"] for r in eng.read_table("domain_state").collect()}
    assert phases["shop.example.cn"] == "blocked_ip"
    assert phases["farm1234.example.com"] == "blocked_ip"
    assert phases["cdn.blocked-range.net"] == "blocked_ip"
    assert phases["sub.graylist.example"] == "blocked_ip"
    assert phases["ok.example.com"] == "done"
    assert phases["www.graylist.example"] == "done"

    visited = {r["domain"] for r in eng.read_table("visits").collect()}
    assert visited == {"ok.example.com", "www.graylist.example"}


def test_no_ip_facts_applies_name_rules_only(spark, tmp_path):
    domains = ["ok.example.com", "shop.example.cn", "farm1234.example.com"]
    pages, doms = _mini_web(spark, domains)
    specs = doms.select("domain", "crawl_depth", "seed_urls")
    eng = SparkCrawlEngine(spark, str(tmp_path / "ipb2"), seed=42, n_buckets=4)
    eng.init_run(doms, specs)
    eng.run_waves(pages, wave_budget=None)
    phases = {r["domain"]: r["phase"] for r in eng.read_table("domain_state").collect()}
    assert phases == {
        "ok.example.com": "done",
        "shop.example.cn": "blocked_ip",
        "farm1234.example.com": "blocked_ip",
    }
