"""Top-domain-grouped waves: per-top-domain token budgets on the virtual
clock (substack=1 permit → serial; default=2), with per-domain order and
seen-set identical to domain-grouped execution."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine, _schedule_offsets
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42


def test_schedule_offsets_semantics():
    # permit=1: strictly serial with 1s cadence
    offs = _schedule_offsets([("a", 5000), ("b", 3000), ("c", 2000)], permits=1)
    assert offs["a"] == 0
    assert offs["b"] == 5000
    assert offs["c"] == 8000
    # permits=2: a,b start (b at cadence 1000), c waits for the first slot
    offs = _schedule_offsets([("a", 5000), ("b", 3000), ("c", 2000)], permits=2)
    assert offs["a"] == 0
    assert offs["b"] == 1000
    assert offs["c"] == 4000  # b's slot frees at 4000


def test_topdomain_grouping_equivalence(spark, tmp_path):
    web, _ = generate_web(seed=SEED, n_domains=12, mean_pages=10)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs = domains.select("domain", "crawl_depth", "seed_urls")

    def visits_of(engine):
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

    e1 = SparkCrawlEngine(spark, str(tmp_path / "dom"), seed=SEED, n_buckets=4)
    e1.init_run(domains, specs)
    e1.run_waves(pages, wave_budget=None, group_key="domain")

    e2 = SparkCrawlEngine(spark, str(tmp_path / "td"), seed=SEED, n_buckets=4)
    e2.init_run(domains, specs)
    e2.run_waves(pages, wave_budget=None, group_key="top_domain")

    assert visits_of(e1) == visits_of(e2)

    # seen-sets identical too
    def seen_of(engine):
        out = {}
        for r in engine.read_table("frontier").collect():
            if r["state"] in ("VISITED", "KNOWN"):
                out.setdefault(r["domain"], {})[r["url_hash"]] = r["state"] == "VISITED"
        return out

    assert seen_of(e1) == seen_of(e2)

    # budget effect visible in the audit trail: fetch_log timestamps of the
    # second same-top-domain member are offset past the first's start
    log = e2.read_table("fetch_log").toPandas()
    by_domain_start = log.groupby("domain")["virtual_ms"].min()
    from marginaliasearch_spark.canon.domain import top_domain_of

    tops = {}
    for d, start in by_domain_start.items():
        tops.setdefault(top_domain_of(d), []).append(start)
    offset_groups = [v for v in tops.values() if len(v) > 1]
    if offset_groups:
        assert any(max(v) - min(v) >= 1000 for v in offset_groups)