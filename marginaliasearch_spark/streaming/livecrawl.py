"""Live-crawl analogue on Structured Streaming.

The reference's live crawler is a micro-batch RSS poller with "no concept
of a crawl frontier" (ref: code/processes/live-crawling-process/java/nu/
marginalia/livecrawler/SimpleLinkScraper.java:34-120): it receives feed
items, skips URLs already present in the main crawl data, applies robots
and the blocklist, fetches politely, and appends to the live table.

Spark-first mapping: a ``readStream`` of feed items →
canonicalize+hash (Arrow-batched pandas UDF) → *stream-static left-anti
join* against the frontier seen-set (the already-crawled skip) →
blocklist Column filter → sink.  A watermarked tumbling-window rollup
gives per-domain ingest metrics with late-data tolerance.

Sinks use ``foreachBatch`` so each micro-batch lands as an atomic
parquet append — the streaming counterpart of the wave snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize
from ..operators.blocklist import blocked_col

FEED_ITEM_SCHEMA = "ts timestamp, feed_domain string, url string, title string"


def live_candidates(feed_items: DataFrame, seen: DataFrame) -> DataFrame:
    """feed items → canonicalized, deduped (vs the static seen-set),
    blocklist-filtered candidates.  Works identically on a static or a
    streaming ``feed_items`` DataFrame (stream-static anti-join is
    supported natively by Structured Streaming)."""
    c = feed_items.withColumn("c", canonicalize(F.col("url")))
    enriched = c.select(
        "ts",
        "feed_domain",
        "url",
        "title",
        F.col("c.url_canon").alias("url_canon"),
        F.col("c.domain").alias("domain"),
        F.col("c.top_domain").alias("top_domain"),
        F.col("c.path").alias("path"),
        F.col("c.url_hash").alias("url_hash"),
    ).filter(F.col("url_canon").isNotNull())

    deduped = enriched.join(
        seen.select("url_hash").distinct(), "url_hash", "left_anti"
    )
    return deduped.filter(~blocked_col(F.col("top_domain"), F.col("path")))


def ingest_rollup(candidates: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Watermarked per-domain tumbling-window ingest counts (late data up
    to 10 minutes)."""
    return (
        candidates.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "domain")
        .agg(F.count("*").alias("n_new_urls"))
        .select(F.col("w.start").alias("bucket_start"), "domain", "n_new_urls")
    )


def start_live_sink(candidates: DataFrame, out_path: str, checkpoint: str):
    """Append each micro-batch atomically via foreachBatch."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        candidates.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .start()
    )
