"""Timed-run deadline (CrawlerMain TimedRun, java:831-878): the wall budget
stops new wave submission; the committed snapshot resumes to an identical
final result."""

import pyspark.sql.functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42


def _setup(spark):
    web, _ = generate_web(seed=SEED, n_domains=6, mean_pages=8)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    return pages, domains, domains.select("domain", "crawl_depth", "seed_urls")


def _visits(engine):
    return sorted(
        (r["domain"], r["url"]) for r in engine.read_table("visits").collect()
    )


def test_deadline_mid_crawl_then_resume_is_identical(spark, tmp_path):
    pages, domains, specs = _setup(spark)

    # uninterrupted golden run
    g = SparkCrawlEngine(spark, str(tmp_path / "g"), seed=SEED, n_buckets=4)
    g.init_run(domains, specs)
    g.run_waves(pages, wave_budget=5)
    golden = _visits(g)

    # deadline expires after the first wave (already-elapsed budget)
    e = SparkCrawlEngine(spark, str(tmp_path / "d"), seed=SEED, n_buckets=4)
    e.init_run(domains, specs)
    n1 = e.run_waves(pages, wave_budget=5, deadline_s=0.0)
    assert n1 == 0  # no wave submitted past the deadline

    n2 = e.run_waves(pages, wave_budget=5, deadline_s=1e-9, max_waves=1)
    assert n2 == 0

    # a tiny-but-positive budget lets exactly one wave through, then stops
    n3 = e.run_waves(pages, wave_budget=5, max_waves=2)
    assert n3 == 2
    still_active = (
        e.read_table("domain_state")
        .filter(F.col("phase").isin("pending", "active"))
        .count()
    )
    assert still_active > 0  # genuinely interrupted mid-crawl

    # resume with no deadline: identical final visited set
    r = SparkCrawlEngine(spark, str(tmp_path / "d"), seed=SEED, n_buckets=4)
    r.run_waves(pages, wave_budget=5)
    assert _visits(r) == golden
