"""Opt-in global politeness throttles (plans/crawl.py): the 512-permit
global request semaphore (HttpFetcherImpl's `requestSema` — wave
analogue: at most N domains advance per quantum) and the
connection-launch throttle (at most C pending→active transitions per
wave).  Both are niceness-only: the final visited set and per-domain
visit order must be IDENTICAL to the unthrottled run."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)

SEED = 42
N_DOMAINS = 16


@pytest.fixture(scope="module")
def web_frames(spark):
    web, _ = generate_web(seed=SEED, n_domains=N_DOMAINS, mean_pages=8)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    return pages, domains


def _run(spark, tmp_path, tag, pages, domains, **engine_kw):
    eng = SparkCrawlEngine(
        spark, str(tmp_path / tag), seed=SEED, n_buckets=4, **engine_kw
    )
    eng.init_run(domains, domains.select("domain", "crawl_depth", "seed_urls"))
    # wave_budget=2 so runs span many waves and the caps actually bind
    eng.run_waves(pages, wave_budget=2)
    return eng


def _per_domain_visits(eng):
    return {
        r["domain"]: list(r["urls"])
        for r in eng.read_table("visits")
        .groupBy("domain")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("wave", "idx", "url"))),
                lambda s: s["url"],
            ).alias("urls")
        )
        .collect()
    }


def _fetching_domains_per_wave(eng):
    """wave → set of domains that performed any request that wave."""
    rows = (
        eng.read_table("fetch_log")
        .groupBy("wave")
        .agg(F.collect_set("domain").alias("doms"))
        .collect()
    )
    return {r["wave"]: set(r["doms"]) for r in rows}


@pytest.fixture(scope="module")
def base_visits(spark, tmp_path_factory, web_frames):
    """One unthrottled reference run shared by all three tests.  Runs
    with the SAME wave_budget=2 as the throttled runs so the equality
    assertions isolate the throttle knobs (not the separately-pinned
    budget-independence invariant)."""
    pages, domains = web_frames
    eng = SparkCrawlEngine(
        spark, str(tmp_path_factory.mktemp("thr") / "base"), seed=SEED, n_buckets=4
    )
    eng.init_run(domains, domains.select("domain", "crawl_depth", "seed_urls"))
    eng.run_waves(pages, wave_budget=2)
    return _per_domain_visits(eng)


def test_global_request_cap_binds_and_preserves_results(
    spark, tmp_path, web_frames, base_visits
):
    pages, domains = web_frames
    cap = 5
    capped = _run(
        spark, tmp_path, "cap", pages, domains, global_request_cap=cap
    )
    per_wave = _fetching_domains_per_wave(capped)
    assert per_wave, "capped run produced no fetch_log"
    assert all(len(doms) <= cap for doms in per_wave.values()), per_wave
    # the cap must actually have deferred somebody (16 domains, cap 5)
    assert max(len(d) for d in per_wave.values()) == cap
    # niceness only: identical visited URLs and per-domain order
    assert _per_domain_visits(capped) == base_visits
    # holders outrank waiters: a domain that fetched in wave w and is not
    # yet terminal keeps fetching in w+1 (no mid-crawl preemption by a
    # lexicographically-smaller pending domain)
    waves = sorted(per_wave)
    terminal_after = {}
    for w in waves:
        for d in per_wave[w]:
            terminal_after[d] = w
    for i, w in enumerate(waves[:-1]):
        nxt = per_wave[waves[i + 1]]
        for d in per_wave[w]:
            if terminal_after[d] > w:  # d still had work after wave w
                assert d in nxt, f"active domain {d} preempted at wave {w}"


def test_conn_launch_throttle_staggers_starts(
    spark, tmp_path, web_frames, base_visits
):
    pages, domains = web_frames
    launches = 3
    throttled = _run(
        spark, tmp_path, "conn", pages, domains,
        conn_launches_per_wave=launches,
    )
    log = throttled.read_table("fetch_log")
    first_wave = {
        r["domain"]: r["w0"]
        for r in log.groupBy("domain").agg(F.min("wave").alias("w0")).collect()
    }
    starts_per_wave: dict = {}
    for d, w in first_wave.items():
        starts_per_wave.setdefault(w, []).append(d)
    assert all(len(v) <= launches for v in starts_per_wave.values()), starts_per_wave
    # k logged domains at ≤3 launches/wave → first fetches span ≥⌈k/3⌉ waves
    assert len(starts_per_wave) >= -(-len(first_wave) // launches)
    # launch order is deterministic lexicographic domain order
    flat = [d for w in sorted(starts_per_wave) for d in sorted(starts_per_wave[w])]
    assert flat == sorted(first_wave)
    assert _per_domain_visits(throttled) == base_visits


def test_both_throttles_compose(spark, tmp_path, web_frames, base_visits):
    pages, domains = web_frames
    both = _run(
        spark, tmp_path, "both", pages, domains,
        global_request_cap=4, conn_launches_per_wave=2,
    )
    per_wave = _fetching_domains_per_wave(both)
    assert all(len(d) <= 4 for d in per_wave.values())
    assert _per_domain_visits(both) == base_visits


def test_zero_throttle_knobs_rejected(spark, tmp_path):
    """cap=0 / launches=0 would empty every runnable set and silently
    report a completed crawl with nothing fetched — must raise instead."""
    for kwargs in (
        {"global_request_cap": 0},
        {"conn_launches_per_wave": 0},
        {"global_request_cap": -1},
    ):
        with pytest.raises(ValueError):
            SparkCrawlEngine(spark, str(tmp_path / "z"), seed=SEED, **kwargs)
