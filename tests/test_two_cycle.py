"""Two-cycle crawl integration: round-1 engine outputs drive round 2 —
crawl_data becomes the recrawl reference, visited counts grow the next
specs (CrawlerMain spec-growth), and the round-2 engine still matches the
round-2 oracle."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators.scheduling import grow_spec_depth
from marginaliasearch_spark.oracle import OracleCrawler
from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42


def test_two_cycles_end_to_end(spark, tmp_path):
    web, _ = generate_web(seed=SEED, n_domains=8, mean_pages=10)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs1 = domains.select("domain", "crawl_depth", "seed_urls")

    # ---- cycle 1
    e1 = SparkCrawlEngine(spark, str(tmp_path / "c1"), seed=SEED, n_buckets=4)
    e1.init_run(domains, specs1)
    e1.run_waves(pages, wave_budget=None)

    # next-cycle specs from cycle-1 visited counts (CrawlerMain:770-781)
    meta = e1.crawl_meta().select("domain", "visited_cnt")
    specs2 = (
        specs1.join(meta, "domain", "left")
        .select(
            "domain",
            F.coalesce(
                grow_spec_depth(F.coalesce(F.col("visited_cnt"), F.lit(0))),
                F.lit(100),
            ).cast("int").alias("crawl_depth"),
            "seed_urls",
        )
    )

    # cycle-1 crawl_data → cycle-2 recrawl reference
    prev = (
        e1.read_table("crawl_data")
        .select(
            "domain",
            (F.col("wave") * 100_000 + F.col("idx")).alias("pos"),
            "url",
            "http_status",
            "image_id",
            "etag",
            "last_modified",
            "lsh64",
        )
    )

    # ---- cycle 2 (Spark)
    e2 = SparkCrawlEngine(spark, str(tmp_path / "c2"), seed=SEED, n_buckets=4)
    e2.init_run(domains, specs2)
    e2.run_waves(pages, wave_budget=None, prev_crawl_df=prev)

    # ---- cycle 2 (oracle) with the same inputs
    oracle = OracleCrawler(web, seed=SEED)
    specs2_rows = {r["domain"]: r["crawl_depth"] for r in specs2.collect()}
    prev_rows: dict = {}
    for r in prev.orderBy("domain", "pos").collect():
        prev_rows.setdefault(r["domain"], []).append(
            {
                "url": r["url"],
                "http_status": r["http_status"],
                "image_id": r["image_id"],
                "etag": r["etag"],
                "last_modified": r["last_modified"],
                "lsh64": r["lsh64"],
            }
        )
    golden = {
        d: oracle.crawl_domain(
            d, crawl_depth=specs2_rows[d], prev_crawl=prev_rows.get(d)
        )
        for d in sorted(web.domains)
    }

    visits = (
        e2.read_table("visits")
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
        assert spark_visits.get(d, []) == g.visited_order, f"cycle-2 order {d}"

    # recrawl actually replayed prior documents for crawled domains
    log2 = e2.read_table("fetch_log")
    replayed = (
        log2.filter(
            F.col("action").isin("FETCH_RECRAWL", "REFERENCE_COPY", "FETCH_304")
        ).count()
    )
    assert replayed > 0
    # conditional fetch actually happens: a static web + stored validators
    # means at least some documents come back 304
    got_304 = log2.filter(F.col("action") == "FETCH_304").count()
    assert got_304 > 0
