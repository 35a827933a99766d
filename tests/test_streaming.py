"""Structured-Streaming live-crawl analogue: stream-static dedup against
the seen-set, blocklist filtering, watermarked rollup, atomic micro-batch
sink."""

import datetime

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.canon.murmur import hash_url_parts
from marginaliasearch_spark.streaming.livecrawl import (
    FEED_ITEM_SCHEMA,
    ingest_rollup,
    live_candidates,
    start_live_sink,
)


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def feed_rows():
    return [
        (_ts(0), "a.com", "https://a.com/new-1", "t1"),
        (_ts(1), "a.com", "https://a.com/seen-already", "t2"),
        (_ts(2), "a.com", "https://www.youtube.com/watch?v=x", "t3"),  # blocklisted
        (_ts(3), "b.com", "https://b.com/new-2#frag", "t4"),
        (_ts(4), "b.com", "https://b.com/new-2", "t5"),  # same after canon — both pass dedup-vs-static, exercise within-batch
        (_ts(50), "b.com", "https://b.com/late", "t6"),
    ]


@pytest.fixture(scope="module")
def seen_df(spark):
    h = hash_url_parts("a.com", "/seen-already", None)
    return spark.createDataFrame([(h,)], "url_hash long")


def test_live_candidates_static(spark, feed_rows, seen_df):
    feed = spark.createDataFrame(feed_rows, FEED_ITEM_SCHEMA)
    out = live_candidates(feed, seen_df).collect()
    urls = sorted(r["url_canon"] for r in out)
    assert "https://a.com/seen-already" not in urls  # deduped vs seen-set
    assert not any("youtube" in u for u in urls)  # blocklist
    assert "https://a.com/new-1" in urls
    assert urls.count("https://b.com/new-2") == 2  # canon collapses #frag


def test_streaming_pipeline(spark, feed_rows, seen_df, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(feed_rows, FEED_ITEM_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(FEED_ITEM_SCHEMA).parquet(src)
    assert stream.isStreaming
    cands = live_candidates(stream, seen_df)
    q = start_live_sink(cands, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    urls = sorted(r["url_canon"] for r in got.collect())
    assert "https://a.com/new-1" in urls
    assert "https://a.com/seen-already" not in urls
    assert "epoch" in got.columns  # atomic micro-batch lineage marker


def test_ingest_rollup_watermarked(spark, feed_rows, seen_df, tmp_path):
    src = str(tmp_path / "src2")
    spark.createDataFrame(feed_rows, FEED_ITEM_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(FEED_ITEM_SCHEMA).parquet(src)
    roll = ingest_rollup(live_candidates(stream, seen_df))
    q = (
        roll.writeStream.outputMode("append")
        .format("memory")
        .queryName("live_rollup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from live_rollup").collect()
    # append mode only emits windows sealed by the watermark: the late
    # t=50 event seals the earlier windows
    got = {(str(r["bucket_start"]), r["domain"]): r["n_new_urls"] for r in rows}
    # windows sealed by the 10:50 event's watermark (10:40): the 10:00 bucket
    assert got[("2026-01-01 10:00:00", "a.com")] == 1
    assert got[("2026-01-01 10:00:00", "b.com")] == 2  # both new-2 rows
    # the 10:50 window is NOT sealed → absent in append mode
    assert ("2026-01-01 10:50:00", "b.com") not in got


def test_polite_schedule_stateful(spark, feed_rows, seen_df, tmp_path):
    """applyInPandasWithState token bucket: per-domain cadence within a
    batch AND state carried across micro-batches."""
    from marginaliasearch_spark.streaming.livecrawl import polite_schedule

    src = str(tmp_path / "src3")
    # two files = two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(feed_rows[:3], FEED_ITEM_SCHEMA).write.parquet(src)
    spark.createDataFrame(feed_rows[3:], FEED_ITEM_SCHEMA).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(FEED_ITEM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sched = polite_schedule(live_candidates(stream, seen_df), delay_ms=1000)
    q = (
        sched.writeStream.outputMode("update")
        .format("memory")
        .queryName("sched")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from sched").collect()
    by_domain: dict = {}
    for r in rows:
        by_domain.setdefault(r["domain"], []).append(r["scheduled_ms"])
    assert by_domain, "scheduler emitted nothing"
    for d, times in by_domain.items():
        ts = sorted(times)
        # cadence ≥ 1000 ms between consecutive fetches of one domain,
        # including across micro-batches (state persisted)
        assert all(b - a >= 1000 for a, b in zip(ts, ts[1:])), (d, ts)
        assert len(set(ts)) == len(ts)
