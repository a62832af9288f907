"""Link discovery: href extraction + URL resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.links import (
    discover_frontier_candidates,
    extract_links,
)


def _page(url: str, body: str):
    return (url, ("<html><body>" + body + "</body></html>").encode())


@pytest.mark.spark
def test_resolution_cases(spark):
    pages = spark.createDataFrame(
        [
            _page(
                "https://a.test/sec/page.html",
                '<a href="https://b.test/x">1</a>'
                "<a href='/root/y'>2</a>"
                '<a href="rel/z.html">3</a>'
                '<a href="//cdn.test/c.css">4</a>'
                '<a href="mailto:a@b.c">no</a>'
                '<a href="javascript:void(0)">no</a>'
                '<a href="#frag">no</a>'
                '<a href="other.html#sec2">5</a>',
            ),
            _page("https://h.test", '<a href="p">rootless</a>'),
        ],
        "url string, html binary",
    )
    got = {
        (r["src_url"], r["abs_url"]) for r in extract_links(pages).collect()
    }
    assert got == {
        ("https://a.test/sec/page.html", "https://b.test/x"),
        ("https://a.test/sec/page.html", "https://a.test/root/y"),
        ("https://a.test/sec/page.html", "https://a.test/sec/rel/z.html"),
        ("https://a.test/sec/page.html", "https://cdn.test/c.css"),
        ("https://a.test/sec/page.html", "https://a.test/sec/other.html"),
        ("https://h.test", "https://h.test/p"),
    }


@pytest.mark.spark
def test_discover_candidates_anti_joins_seen(spark):
    from commoncrawl_spark.operators.seen_set import with_url_key

    pages = spark.createDataFrame(
        [
            _page("https://a.test/1", '<a href="/new">n</a><a href="/old">o</a>'),
            _page("https://a.test/2", '<a href="/new">dup</a>'),
        ],
        "url string, html binary",
    )
    seen = with_url_key(
        spark.createDataFrame([("https://a.test/old",)], "url string")
    ).select("url_sha1")
    got = [r["url"] for r in discover_frontier_candidates(pages, seen).collect()]
    assert got == ["https://a.test/new"]  # deduped and seen-filtered


@pytest.mark.spark
def test_extraction_is_codegen_only(spark):
    pages = spark.createDataFrame(
        [_page("https://a.test/p", '<a href="/x">l</a>')], "url string, html binary"
    )
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
