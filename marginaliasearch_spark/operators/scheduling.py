"""Priority-ordered scheduling + politeness budgets.

Reimplements the reference's spec-ordering comparators and per-top-domain
token budgets as DataFrame operators:

- batch-run order: domains whose top-domain has ≥8 sibling domains first
  (keeps semaphore-sharing domains together), then random
  (ref: CrawlerMain.java:519-541 — reference uses a fresh Random per run;
  we pin rand(seed) so runs are reproducible, a documented determinism
  contract);
- timed-run order: least-recently-crawled first, never-crawled first of
  all, domain-name tiebreak (ref: CrawlerMain.java:513-517; tested by
  CrawlerMainTest.java:53-85);
- NDP priority queue: ORDER BY priority DESC LIMIT n
  (ref: code/processes/new-domain-process/.../DomainTestingQueue.java:105-112);
- per-top-domain parallelism budgets (wordpress.com 16, blogspot/tumblr/
  neocities/github.io 8, substack 1, default 2) with ≥1 s lock cadence
  (ref: code/libraries/domain-lock/.../LocalDomainCoordinator.java:22-122)
  → modeled as a makespan estimate over per-domain virtual crawl times;
- depth/spec growth arithmetic (ref: DomainCrawlFrontier.java:69-76,
  CrawlerMain.java:98-101,770-781);
- work-log compaction: last entry per domain wins
  (ref: CrawlerMain.java:472-489).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOP_DOMAIN_PERMITS = {
    "wordpress.com": 16,
    "blogspot.com": 8,
    "tumblr.com": 8,
    "neocities.org": 8,
    "github.io": 8,
    "substack.com": 1,
}
DEFAULT_PERMITS = 2


def permits_col(top_domain: Column) -> Column:
    expr = F.lit(DEFAULT_PERMITS)
    for td, n in TOP_DOMAIN_PERMITS.items():
        expr = F.when(top_domain == td, F.lit(n)).otherwise(expr)
    return expr


def batch_run_order(specs: DataFrame, seed: int = 42, top_col: str = "top_domain") -> DataFrame:
    """Batch-run spec order: sibling-heavy top-domains (≥8 siblings)
    first, then a seeded per-domain shuffle (CrawlerMain.java:527-542 —
    grouped-first comparator, then a per-domain random draw; the
    reference deliberately re-rolls per process start, this engine pins
    the draw to ``seed`` as its documented determinism pin).

    The draw is ``md5(seed|domain)`` — a pure Column op whose value is a
    function of the ROW alone, so the order is identical under any
    partition layout or cluster size.  (The previous ``F.rand(seed)``
    draw depended on the task split: the same spec list ordered
    differently on different clusters.)"""
    siblings = specs.groupBy(top_col).agg(F.count("*").alias("sibling_count"))
    return (
        specs.join(F.broadcast(siblings), top_col)
        .withColumn("_grouped_first", (F.col("sibling_count") >= 8).cast("int"))
        .withColumn("_draw", F.md5(F.concat(F.lit(f"{seed}|"), F.col("domain"))))
        .orderBy(F.desc("_grouped_first"), F.col("_draw"), F.col("domain"))
        .drop("_grouped_first", "sibling_count", "_draw")
    )


def timed_run_order(specs: DataFrame, last_crawl_col: str = "last_crawl_ms") -> DataFrame:
    """Least-recently-crawled first (never-crawled = epoch 0), name tiebreak."""
    return specs.orderBy(
        F.coalesce(F.col(last_crawl_col), F.lit(0)).asc(), F.col("domain").asc()
    )


def priority_queue_batch(domains: DataFrame, n: int = 2000, priority_col: str = "priority") -> DataFrame:
    return domains.orderBy(F.desc(priority_col), F.col("domain")).limit(n)


def grow_depth(depth: Column, visited: Column, factor: float = 1.5, max_abs: int = 2500) -> Column:
    """increaseDepth: base=max(visited, depth); min(base+max_abs, base*factor)."""
    base = F.greatest(visited, depth)
    return F.least(base + F.lit(max_abs), (base * F.lit(factor)).cast("long"))


def grow_spec_depth(visited: Column) -> Column:
    """Next-cycle crawl depth: clamp(visited*f, 100, 10000), f=2.5 below 2k
    else 1.25 (CrawlerMain.java:98-101,770-781)."""
    f = F.when(visited < 2000, F.lit(2.5)).otherwise(F.lit(1.25))
    return F.least(F.greatest((visited * f).cast("long"), F.lit(100)), F.lit(10_000))


def compact_work_log(log: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Last-wins per domain (window dedup ≡ Iceberg MERGE last-wins)."""
    w = Window.partitionBy("domain").orderBy(F.desc(ts_col))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_domain_makespan(crawl_meta: DataFrame, top_col: str = "top_domain") -> DataFrame:
    """Politeness-budget wall-clock model: per top-domain, the crawl of its
    member domains is limited to `permits` concurrent domains (plus a 1 s
    cadence between lock grants), so estimated wall time is the classic
    LPT bound max(max_i t_i, ceil(Σ t_i / permits)) + cadence."""
    agg = crawl_meta.groupBy(top_col).agg(
        F.count("*").alias("n_domains"),
        F.sum("crawl_time_ms").alias("sum_ms"),
        F.max("crawl_time_ms").alias("max_ms"),
    )
    permits = permits_col(F.col(top_col))
    cadence_ms = (F.col("n_domains") - 1) * 1000
    return agg.select(
        top_col,
        "n_domains",
        permits.alias("permits"),
        F.greatest(
            F.col("max_ms"), F.ceil(F.col("sum_ms") / permits).cast("long")
        ).alias("budget_wall_ms"),
        (F.greatest(
            F.col("max_ms"), F.ceil(F.col("sum_ms") / permits).cast("long")
        ) + cadence_ms).alias("budget_wall_with_cadence_ms"),
    )


def availability_classify(
    domains: DataFrame,
    availability: DataFrame,
    now_ms: int,
    stale_days: int = 3,
    error_days: int = 7,
) -> DataFrame:
    """Ping-subsystem availability join: REACHABLE / FLAKEY / MISSING with
    a 3-day staleness + 7-day error window; MISSING rows are dropped from
    the crawl (ref: CrawlerMain.java:331-378,314-317)."""
    stale_ms = stale_days * 86_400_000
    error_ms = error_days * 86_400_000
    joined = domains.join(availability, "domain", "left")
    state = (
        F.when(F.col("last_ping_ms").isNull(), "MISSING")
        .when(F.col("last_ping_ms") < now_ms - stale_ms, "MISSING")
        .when(
            F.col("last_error_ms").isNotNull()
            & (F.col("last_error_ms") > now_ms - error_ms),
            "FLAKEY",
        )
        .otherwise("REACHABLE")
    )
    return joined.withColumn("availability", state).filter(
        F.col("availability") != "MISSING"
    )
