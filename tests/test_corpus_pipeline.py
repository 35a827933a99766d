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


def test_compose_training_set(spark, tmp_path):
    """The full composition pass: exact-dup copies dropped, near-dup
    groups reduced to their best-quality member, per-language cap applied
    deterministically."""
    from marginaliasearch_spark.plans.corpus_pipeline import compose_training_set

    docs = spark.createDataFrame(
        [
            # near-dup pair (same long text modulo one word) — higher
            # quality member must win
            ("https://a.example/1", "a.example",
             "the quick brown fox jumps over the lazy dog again and again today"),
            ("https://a.example/2", "a.example",
             "the quick brown fox jumps over the lazy dog again and again tonight"),
            # exact dup pair — keeper is the lower url
            ("https://b.example/1", "b.example", "completely different text one two three four five"),
            ("https://b.example/2", "b.example", "completely different text one two three four five"),
            # singleton
            ("https://c.example/1", "c.example", "unrelated content with nothing shared at all here"),
        ],
        "url string, domain string, text string",
    )
    from marginaliasearch_spark.plans.corpus_pipeline import enrich_corpus

    enriched = enrich_corpus(docs)
    out = compose_training_set(enriched, near_dup_threshold=0.5)
    urls = sorted(r["url"] for r in out.select("url").collect())
    # exact-dup copy gone (b/2), near-dup group reduced to ONE member,
    # singleton kept
    assert "https://b.example/2" not in urls
    assert len([u for u in urls if u.startswith("https://a.example/")]) == 1
    assert "https://c.example/1" in urls
    assert len(urls) == 3

    # determinism under repartitioning
    out2 = compose_training_set(enriched.repartition(7), near_dup_threshold=0.5)
    assert sorted(r["url"] for r in out2.select("url").collect()) == urls

    # per-language cap engages
    capped = compose_training_set(enriched, near_dup_threshold=0.5, max_per_lang=1)
    per = capped.groupBy("lang_pred").count().collect()
    assert all(r["count"] <= 1 for r in per)
