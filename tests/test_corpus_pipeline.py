"""Crawl → training-data bridge (plans/corpus_pipeline.py): crawl outputs
become an enriched, dedup-flagged document corpus in one composed plan."""

import pyspark.sql.functions as F

from marginaliasearch_spark.plans.corpus_pipeline import corpus_from_crawl, enrich_corpus
from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)


def test_crawl_to_enriched_corpus(spark, tmp_path):
    web, _ = generate_web(seed=42, n_domains=6, mean_pages=8)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    eng = SparkCrawlEngine(spark, str(tmp_path / "c"), seed=42, n_buckets=4)
    eng.init_run(domains, domains.select("domain", "crawl_depth", "seed_urls"))
    eng.run_waves(pages, wave_budget=None)

    docs = corpus_from_crawl(eng.read_table("crawl_data"), pages)
    n = docs.count()
    assert n > 0
    # only stored 200 html documents with bodies made it through
    assert docs.filter(F.col("text").isNull()).count() == 0

    enriched = enrich_corpus(docs).cache()
    cols = set(enriched.columns)
    assert {"lang_pred", "n_words", "fingerprint", "dup_count", "is_dup_copy"} <= cols
    assert enriched.count() == n  # enrichment is row-preserving
    # every doc has a language and a fingerprint
    assert enriched.filter(F.col("lang_pred").isNull()).count() == 0
    # dup groups are consistent: keeper rows are not flagged as copies
    groups = enriched.groupBy("content_hash").agg(
        F.sum("is_dup_copy").alias("n_copies"), F.count("*").alias("n")
    )
    assert groups.filter(F.col("n_copies") != F.col("n") - 1).count() == 0
