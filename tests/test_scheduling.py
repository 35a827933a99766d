"""Scheduling operators: spec orders, permits/makespan, growth arithmetic,
work-log compaction (CrawlerMainTest.java:19-85 semantics)."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators.scheduling import (
    batch_run_order,
    compact_work_log,
    grow_depth,
    grow_spec_depth,
    priority_queue_batch,
    timed_run_order,
    top_domain_makespan,
)


def test_timed_run_order(spark):
    # least-recently-crawled first; never-crawled first of all; name tiebreak
    specs = spark.createDataFrame(
        [
            ("b.com", 2000),
            ("a.com", None),
            ("c.com", 1000),
            ("aa.com", None),
        ],
        "domain string, last_crawl_ms long",
    )
    got = [r["domain"] for r in timed_run_order(specs).collect()]
    assert got == ["a.com", "aa.com", "c.com", "b.com"]


def test_batch_run_order_grouped_first_and_seeded(spark):
    rows = [(f"u{i}.blogspot.com", "blogspot.com") for i in range(10)] + [
        ("x.com", "x.com"),
        ("y.com", "y.com"),
    ]
    specs = spark.createDataFrame(rows, "domain string, top_domain string")
    o1 = [r["domain"] for r in batch_run_order(specs, seed=1).collect()]
    o2 = [r["domain"] for r in batch_run_order(specs, seed=1).collect()]
    assert o1 == o2  # seeded determinism
    # sibling-heavy top-domain (>=8 members) comes first
    assert all(d.endswith("blogspot.com") for d in o1[:10])


def test_priority_queue_batch(spark):
    d = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 7)], "domain string, priority int"
    )
    got = [r["domain"] for r in priority_queue_batch(d, n=2).collect()]
    assert got == ["b", "c"]


def test_growth_arithmetic(spark):
    df = spark.createDataFrame(
        [(50, 100), (5000, 100), (1500, 2000)], "visited long, depth long"
    )
    rows = df.select(
        grow_depth(F.col("depth"), F.col("visited")).alias("g"),
        grow_spec_depth(F.col("visited")).alias("s"),
    ).collect()
    # base=max(visited,depth); min(base+2500, base*1.5)
    assert rows[0]["g"] == min(100 + 2500, int(100 * 1.5))  # 150
    assert rows[1]["g"] == min(5000 + 2500, int(5000 * 1.5))  # 7500
    assert rows[2]["g"] == min(2000 + 2500, int(2000 * 1.5))  # 3000
    # clamp(visited*f, 100, 10000), f=2.5 below 2000 else 1.25
    assert rows[0]["s"] == max(100, int(50 * 2.5))  # 125
    assert rows[1]["s"] == min(10_000, int(5000 * 1.25))  # 6250
    assert rows[2]["s"] == int(1500 * 2.5)  # 3750


def test_compact_work_log(spark):
    log = spark.createDataFrame(
        [("a.com", 1, "p1"), ("a.com", 3, "p3"), ("a.com", 2, "p2"), ("b.com", 1, "q1")],
        "domain string, ts long, path string",
    )
    got = {r["domain"]: r["path"] for r in compact_work_log(log).collect()}
    assert got == {"a.com": "p3", "b.com": "q1"}


def test_top_domain_makespan(spark):
    meta = spark.createDataFrame(
        [
            ("u1.wordpress.com", "wordpress.com", 10_000),
            ("u2.wordpress.com", "wordpress.com", 10_000),
            ("s1.substack.com", "substack.com", 10_000),
            ("s2.substack.com", "substack.com", 10_000),
            ("plain.com", "plain.com", 30_000),
        ],
        "domain string, top_domain string, crawl_time_ms long",
    )
    got = {r["top_domain"]: r for r in top_domain_makespan(meta).collect()}
    assert got["wordpress.com"]["permits"] == 16
    # 2 domains, 16 permits → makespan = max single domain
    assert got["wordpress.com"]["budget_wall_ms"] == 10_000
    # substack: 1 permit → serial
    assert got["substack.com"]["permits"] == 1
    assert got["substack.com"]["budget_wall_ms"] == 20_000
    assert got["plain.com"]["permits"] == 2
    assert got["plain.com"]["budget_wall_ms"] == 30_000


def test_batch_run_order_partition_invariant(spark):
    """The seeded draw is a function of the row alone (md5, not F.rand):
    the physical output order must be identical under any partition
    layout — the property a cluster resize would otherwise break — and
    must equal the gate's rank derivation."""
    import pandas as pd

    from marginaliasearch_spark.operators.scheduling import batch_run_order

    # sibling counts straddle the >=8 threshold: one 20-member top
    # domain, one 8, one 7 (boundary), and singles
    rows = [
        {"domain": f"d{i}.big.example.com", "top_domain": "big.example.com"}
        for i in range(20)
    ] + [
        {"domain": f"d{i}.edge8.example.com", "top_domain": "edge8.example.com"}
        for i in range(8)
    ] + [
        {"domain": f"d{i}.edge7.example.com", "top_domain": "edge7.example.com"}
        for i in range(7)
    ] + [
        {"domain": f"solo{i}.example.com", "top_domain": f"solo{i}.example.com"}
        for i in range(22)
    ]
    specs = spark.createDataFrame(pd.DataFrame(rows))

    orders = []
    for parts in (1, 7, 32):
        got = [
            r["domain"]
            for r in batch_run_order(specs.repartition(parts), seed=42).collect()
        ]
        orders.append(got)
    assert orders[0] == orders[1] == orders[2], "order depends on partitioning"
    assert sorted(orders[0]) == sorted(r["domain"] for r in rows)

    # grouped-first: every >=8-sibling top-domain precedes every smaller
    # one (the 7-sibling boundary group must land in the back block)
    counts: dict = {}
    top_of = {r["domain"]: r["top_domain"] for r in rows}
    for r in rows:
        counts[r["top_domain"]] = counts.get(r["top_domain"], 0) + 1
    flags = [counts[top_of[d]] >= 8 for d in orders[0]]
    assert flags == sorted(flags, reverse=True)
    assert sum(flags) == 28  # big(20) + edge8(8); edge7 + solos follow

    # a different seed produces a different permutation (the draw binds)
    other = [r["domain"] for r in batch_run_order(specs, seed=43).collect()]
    assert other != orders[0]
