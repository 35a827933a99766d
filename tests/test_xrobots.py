"""X-Robots-Tag algebra + output-stage content-type gate
(SlopCrawlDataRecord.java:165-259 semantics)."""

from marginaliasearch_spark.functions.xrobots import (
    is_content_type_accepted,
    is_x_robots_tags_permitted,
    should_store_response,
)

UA = "search.marginalia.nu"


def test_xrobots_general():
    assert is_x_robots_tags_permitted([], UA)
    assert not is_x_robots_tags_permitted(["noindex"], UA)
    assert not is_x_robots_tags_permitted(["none"], UA)
    assert is_x_robots_tags_permitted(["nofollow"], UA)


def test_xrobots_ua_scoped():
    # UA-scoped noindex forbids even when general allows
    assert not is_x_robots_tags_permitted([f"{UA}: noindex"], UA)
    assert not is_x_robots_tags_permitted([f"{UA}: none"], UA)
    # UA-scoped all overrides a general noindex
    assert is_x_robots_tags_permitted(["noindex", f"{UA}: all"], UA)
    # other bots' scoped tags are irrelevant
    assert is_x_robots_tags_permitted(["googlebot: noindex"], UA)
    # UA-scoped forbid beats UA-scoped nothing, loses to UA-scoped all
    assert is_x_robots_tags_permitted([f"{UA}: noindex", f"{UA}: all"], UA)


def test_content_type_gate():
    assert is_content_type_accepted("text/html; charset=utf-8")
    assert is_content_type_accepted("application/xhtml+xml")
    assert is_content_type_accepted("image/png")
    assert not is_content_type_accepted("text/css")
    assert not is_content_type_accepted("application/octet-stream")
    assert is_content_type_accepted("application/octet-stream", "/doc.md")
    assert is_content_type_accepted("application/octet-stream", "/paper.pdf")
    assert is_content_type_accepted(None)  # defaults text/plain


def test_should_store():
    assert not should_store_response("/robots.txt", "text/plain", [], UA)
    assert should_store_response("/index.html", "text/html", [], UA)
    assert not should_store_response("/index.html", "text/html", ["noindex"], UA)
    assert not should_store_response("/style.css", "text/css", [], UA)
