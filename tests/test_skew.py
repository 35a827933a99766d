"""Skew handling: a Zipf-head domain (~100× the median) must neither break
correctness nor hot-spot the crawl — per-domain state stays bounded by the
frontier cap and the heavy domain's work is bounded by its own depth."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.oracle import OracleCrawler
from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)


def test_heavy_domain_correctness_and_bounds(spark, tmp_path):
    web, _ = generate_web(seed=7, n_domains=8, mean_pages=10, heavy_domain_pages=800)
    heavy = [d for d in web.domains if len([1 for k in web._pages if k[0] == d]) > 500]
    assert heavy, "generator should have made a heavy domain"
    heavy = heavy[0]

    oracle = OracleCrawler(web, seed=7)
    golden = {d: oracle.crawl_domain(d) for d in sorted(web.domains)}

    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs = domains.select("domain", "crawl_depth", "seed_urls")

    engine = SparkCrawlEngine(spark, str(tmp_path / "skew"), seed=7, n_buckets=8)
    engine.init_run(domains, specs)
    engine.run_waves(pages, wave_budget=None)

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
        assert spark_visits.get(d, []) == g.visited_order, d

    # per-domain frontier state is bounded: ≤ depth + 10_000 rows ever
    fr_counts = (
        engine.read_table("frontier").groupBy("domain").count().collect()
    )
    depth_by_domain = {r["domain"]: r["crawl_depth"] for r in domains.collect()}
    for r in fr_counts:
        cap = depth_by_domain[r["domain"]] + 10_000 + r["count"]  # sanity: queue+seen
        assert r["count"] <= depth_by_domain[r["domain"]] * 2 + 10_000 + 64, r

    # heavy domain's visits are bounded by its crawl depth
    g = golden[heavy]
    assert len(g.visited_order) <= depth_by_domain[heavy] + 1
