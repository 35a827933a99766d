"""Per-domain cookie jar (functions/cookies.py; DomainCookies.java port):
planted Set-Cookie fixtures → the has_cookies marker on every stored
record, per visited URL, including across wave suspension/resume."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.functions.cookies import DomainCookies
from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.synthetic_web import (
    normalize_pages_pdf,
    spark_schemas,
)


def test_jar_parse_semantics():
    """DomainCookies.parseCookieHeader:28-46: first ';' part, split on
    first '=', trim; bare tokens without '=' are not stored; later
    Set-Cookie overwrites the same name."""
    jar = DomainCookies()
    assert not jar.has_cookies()
    jar.update_from_set_cookie(["sid=abc123; Path=/; HttpOnly"])
    assert jar.cookies == {"sid": "abc123"}
    jar.update_from_set_cookie([" theme = dark ; Expires=never"])
    assert jar.cookies["theme"] == "dark"
    jar.update_from_set_cookie(["flagonly; Path=/"])  # no '=' → dropped
    assert "flagonly" not in jar.cookies
    jar.update_from_set_cookie(["empty=; Path=/"])
    assert jar.cookies["empty"] == ""
    jar.update_from_set_cookie(["sid=zzz"])
    assert jar.cookies["sid"] == "zzz"
    assert "sid=zzz" in jar.cookie_header()


def _cookie_web_frames():
    """Two domains: cookie.example sets a cookie on /a.html (second visit);
    plain.example never sets one."""
    def page(domain, path, links, set_cookie=None):
        return {
            "domain": domain, "path": path, "param": None,
            "url": f"https://{domain}{path}", "status": 200,
            "redirect_to": None, "content_type": "text/html",
            "image_id": None, "base_href": None,
            "links": links, "feed_links": [], "body_marker": None,
            "etag": None, "last_modified": None, "body_text": "<html>x</html>",
            "set_cookie": set_cookie,
        }

    pages = [
        page("cookie.example", "/", ["/a.html", "/b.html"]),
        page("cookie.example", "/a.html", ["/c.html"],
             set_cookie="sid=tok42; Path=/; Secure"),
        page("cookie.example", "/b.html", []),
        page("cookie.example", "/c.html", []),
        page("plain.example", "/", ["/x.html"]),
        page("plain.example", "/x.html", []),
    ]
    domains = [
        {"domain": d, "top_domain": d, "proto": "https", "probe": "ok",
         "robots_txt": None, "site_kind": "plain", "crawl_depth": 10,
         "seed_urls": [], "sitemap_urls": [], "generator_meta": None,
         "has_lemmy_config": False}
        for d in ("cookie.example", "plain.example")
    ]
    return (
        normalize_pages_pdf(pd.DataFrame(pages)),
        pd.DataFrame(domains),
    )


EXPECTED = {
    # marker per stored URL: 0 before the first Set-Cookie response,
    # 1 from the response that set it onward (jar updates BEFORE the
    # record is written — WarcRecorder.java:114,140)
    "https://cookie.example/": 0,
    "https://cookie.example/a.html": 1,
    "https://cookie.example/b.html": 1,
    "https://cookie.example/c.html": 1,
    "https://plain.example/": 0,
    "https://plain.example/x.html": 0,
}


@pytest.mark.parametrize("wave_budget", [None, 1])
def test_has_cookies_marker_per_url(spark, tmp_path, wave_budget):
    """wave_budget=1 additionally proves the jar survives the state_json
    suspend/rehydrate cycle between waves."""
    pages_pdf, domains_pdf = _cookie_web_frames()
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    eng = SparkCrawlEngine(
        spark, str(tmp_path / f"c{wave_budget}"), seed=42, n_buckets=2
    )
    eng.init_run(domains, domains.select("domain", "crawl_depth", "seed_urls"))
    eng.run_waves(pages, wave_budget=wave_budget)
    got = {
        r["url"]: r["has_cookies"]
        for r in eng.read_table("crawl_data")
        .select("url", "has_cookies")
        .collect()
    }
    assert got == EXPECTED


def test_slop_parity_columns_at_rest(spark, tmp_path):
    """Slop at-rest parity (SlopCrawlDataRecord.java:35-54): every stored
    record carries ip / timestamp / request_time_ms / header; timestamps
    ride the virtual clock over the fixed epoch so two identical runs are
    bit-identical, per-domain nondecreasing in visit order."""
    from marginaliasearch_spark.oracle.session import _RECORD_EPOCH_MS, synth_ip
    from marginaliasearch_spark.sources.synthetic_web import fetch_time_ms

    pages_pdf, domains_pdf = _cookie_web_frames()
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)

    def run(tag):
        eng = SparkCrawlEngine(spark, str(tmp_path / tag), seed=42, n_buckets=2)
        eng.init_run(domains, domains.select("domain", "crawl_depth", "seed_urls"))
        eng.run_waves(pages, wave_budget=None)
        return sorted(
            tuple(r)
            for r in eng.read_table("crawl_data")
            .select("domain", "url", "ip", "timestamp", "request_time_ms",
                    "header", "wave", "idx")
            .collect()
        )

    rows1, rows2 = run("p1"), run("p2")
    assert rows1 == rows2, "timestamps not reproducible across identical runs"
    assert rows1, "no records stored"
    by_domain: dict = {}
    for dom, url, ip, ts, rt, header, wave, idx in rows1:
        assert ip == synth_ip(dom)
        assert ts >= _RECORD_EPOCH_MS
        assert rt == fetch_time_ms(url)
        assert header.startswith("Content-Type: ")
        by_domain.setdefault(dom, []).append((wave, idx, ts))
    for dom, recs in by_domain.items():
        recs.sort()
        stamps = [ts for _, _, ts in recs]
        assert stamps == sorted(stamps), f"{dom}: timestamps not monotone in visit order"
