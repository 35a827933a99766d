"""Snapshot time travel: roll the catalog back to an earlier wave and
re-run — the final state must equal an uninterrupted run (the EP3
WARC-resynchronization analogue: the tables at the snapshot ARE the
resync state)."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42


def _visits(engine):
    return {
        r["domain"]: list(r["urls"])
        for r in engine.read_table("visits")
        .groupBy("domain")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("wave", "idx", "url"))),
                lambda s: s["url"],
            ).alias("urls")
        )
        .collect()
    }


def test_rollback_and_rerun(spark, tmp_path):
    web, _ = generate_web(seed=SEED, n_domains=8, mean_pages=10)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs = domains.select("domain", "crawl_depth", "seed_urls")

    # golden uninterrupted run
    g = SparkCrawlEngine(spark, str(tmp_path / "gold"), seed=SEED, n_buckets=4)
    g.init_run(domains, specs)
    g.run_waves(pages, wave_budget=6)
    golden = _visits(g)

    # second run: crawl fully, roll back to wave 2, rerun from there
    e = SparkCrawlEngine(spark, str(tmp_path / "rb"), seed=SEED, n_buckets=4)
    e.init_run(domains, specs)
    e.run_waves(pages, wave_budget=6)
    latest = e.catalog.latest_snapshot()
    assert latest is not None and latest > 2

    e.catalog.rollback_to(2)
    assert e.catalog.latest_snapshot() == 2

    # a fresh engine resumes from the rolled-back snapshot
    e2 = SparkCrawlEngine(spark, str(tmp_path / "rb"), seed=SEED, n_buckets=4)
    e2.run_waves(pages, wave_budget=6)
    assert _visits(e2) == golden
