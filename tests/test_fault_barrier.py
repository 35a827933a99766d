"""Per-domain fault isolation: a domain whose input rows blow up inside
the wave UDF terminates with phase='error' (exception recorded) while
every other domain's crawl proceeds — the reference likewise catches
per-domain exceptions in CrawlTask (CrawlerMain.java:700-716)."""

import json

import pandas as pd
from pyspark.sql import functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    normalize_pages_pdf,
    spark_schemas,
)


def test_poisoned_domain_isolated(spark, tmp_path):
    rows = []

    def page(domain, path, links=(), status=200):
        rows.append({
            "domain": domain, "path": path, "param": None,
            "url": f"https://{domain}{path}", "status": status,
            "redirect_to": None, "content_type": "text/html",
            "image_id": None, "base_href": None, "links": list(links),
            "feed_links": [], "body_marker": None, "etag": None,
            "last_modified": None, "body_text": None,
        })

    page("good.example.org", "/", links=["/a.html"])
    page("good.example.org", "/a.html")
    # poisoned: a corrupt page row (NULL status) crashes the domain's
    # web construction inside the wave UDF
    page("bad.example.org", "/", links=["/x.html"])
    page("bad.example.org", "/x.html", status=None)

    drows = [
        {
            "domain": d, "top_domain": "example.org", "proto": "https",
            "probe": "ok", "robots_txt": None, "site_kind": "default",
            "crawl_depth": 100, "seed_urls": [], "sitemap_urls": [],
            "generator_meta": "", "has_lemmy_config": False,
        }
        for d in ("good.example.org", "bad.example.org")
    ]
    ps, ds = spark_schemas()
    # dtype=object: the NULL status must stay None, not decay the column
    # to float64 (which createDataFrame would reject)
    pages = spark.createDataFrame(
        normalize_pages_pdf(pd.DataFrame(rows, dtype=object)), schema=ps
    )
    doms = spark.createDataFrame(pd.DataFrame(drows), schema=ds)

    eng = SparkCrawlEngine(spark, str(tmp_path / "run"), seed=42, n_buckets=4)
    eng.init_run(doms, doms.select("domain", "crawl_depth", "seed_urls"))
    eng.run_waves(pages, wave_budget=None)  # must not raise

    states = {
        r["domain"]: (r["phase"], r["state_json"])
        for r in eng.read_table("domain_state").collect()
    }
    # the healthy domain crawled to completion
    assert states["good.example.org"][0] == "done"
    visits = {r["url"] for r in eng.read_table("visits").collect()}
    assert "https://good.example.org/a.html" in visits
    # the poisoned domain is terminal-error with the exception recorded
    phase, sj = states["bad.example.org"]
    assert phase == "error"
    assert "exception" in json.loads(sj)
    # and it never contaminated the healthy domain's outputs
    assert not any(u.startswith("https://bad.") for u in visits)
