"""Crawl → training-data bridge: crawl outputs become an enriched corpus.

The engine's two halves composed end-to-end: the wave crawler produces
``crawl_data`` (what was fetched and kept) and the synthetic web carries
the bodies; this plan turns them into the document table a training-data
pipeline consumes — language-ID'd, quality-scored, token-counted,
fingerprinted and exact-dup-flagged, in pure Column expressions plus the
one numpy fingerprint UDF.

Scale shape: one join of the cycle's crawl_data against the page store
(both hash-partitioned on domain/url), then a single projection pass —
no extra shuffles beyond the dedup groupBy on the content hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup
from ..operators.textstats import doc_fingerprint, lang_id, quality_score, token_counts


def corpus_from_crawl(crawl_data: DataFrame, pages: DataFrame) -> DataFrame:
    """(url, domain, text) for every stored 200 text/html document with a
    body.  ``pages`` is the body store (in production the WARC/Slop
    table; here the synthetic web table)."""
    kept = (
        crawl_data.filter(
            (F.col("http_status") == 200) & (F.col("content_type") == "text/html")
        )
        .select("domain", "url")
        .dropDuplicates(["url"])  # recrawl cycles re-record unchanged docs
    )
    bodies = pages.filter(F.col("body_text").isNotNull()).select(
        "url", F.col("body_text").alias("text")
    )
    return kept.join(bodies, "url").select("url", "domain", "text")


def enrich_corpus(docs: DataFrame) -> DataFrame:
    """One enrichment pass: language, quality features, token counts,
    winnowing fingerprint, exact-dup keeper flag."""
    out = lang_id(docs)
    out = quality_score(out)
    out = token_counts(out)
    out = doc_fingerprint(out)
    # exact-dup flag: keeper = lowest url (string order) per content hash
    keepers = (
        docs.withColumn("content_hash", F.md5(F.col("text")))
        .groupBy("content_hash")
        .agg(F.min("url").alias("keeper_url"), F.count("*").alias("dup_count"))
    )
    out = out.withColumn("content_hash", F.md5(F.col("text"))).join(
        keepers, "content_hash"
    )
    return out.withColumn(
        "is_dup_copy", (F.col("url") != F.col("keeper_url")).cast("int")
    ).drop("keeper_url")


__all__ = ["corpus_from_crawl", "enrich_corpus", "exact_dedup"]
