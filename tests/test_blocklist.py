"""Host blocklist: equality + subdomain suffix matching, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.blocklist import (
    filter_blocked_hosts,
    host_suffixes_col,
)


@pytest.mark.spark
def test_host_suffixes(spark):
    df = spark.createDataFrame(
        [("a.b.site.test",), ("site.test",), ("localhost",)], "h string")
    got = {r["h"]: r["s"] for r in df.select(
        "h", host_suffixes_col(F.col("h")).alias("s")).collect()}
    assert got["a.b.site.test"] == [
        "site.test", "b.site.test", "a.b.site.test"]
    assert got["site.test"] == ["site.test"]
    assert got["localhost"] == []


@pytest.mark.spark
def test_filter_blocked_hosts_subdomains(spark):
    urls = spark.createDataFrame(
        [("https://www.site.test/x",),       # www stripped -> equality hit
         ("https://deep.sub.site.test/y",),  # subdomain hit
         ("https://site.test.evil/z",),      # suffix of LABELS, not chars
         ("https://other.test/w",)],
        "url string")
    bl = spark.createDataFrame([("site.test",)], "domain string")
    kept = {r["url"] for r in filter_blocked_hosts(urls, bl).collect()}
    assert kept == {"https://site.test.evil/z", "https://other.test/w"}
    blocked = {r["url"] for r in
               filter_blocked_hosts(urls, bl, invert=True).collect()}
    assert blocked == {"https://www.site.test/x",
                       "https://deep.sub.site.test/y"}


@pytest.mark.spark
def test_filter_blocked_hosts_plan(spark):
    """The blocklist joins broadcast (never a nested loop over the list),
    and no Python appears in the plan."""
    urls = spark.createDataFrame([("https://a.test/x",)], "url string")
    bl = spark.createDataFrame([("a.test",)], "domain string")
    plan = (filter_blocked_hosts(urls, bl)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


@pytest.mark.spark
def test_url_word_scores_soft_and_strict(spark):
    from commoncrawl_spark.operators.blocklist import url_word_scores

    urls = spark.createDataFrame(
        [("https://casino-poker.test/slots",),   # 3 weighted tokens
         ("https://news.test/poker-rules",),     # 1 token, under threshold
         ("https://essex.edu/about",),           # substring, NOT a token
         ("https://xbadwordx.test/page",),       # strict substring hit
         ("https://clean.test/a",)],
        "url string")
    out = {r["url"]: r for r in url_word_scores(
        urls,
        {"casino": 1.0, "poker": 0.5, "slots": 0.5, "sex": 1.0},
        strict_terms=["badword"], threshold=1.0).collect()}
    assert out["https://casino-poker.test/slots"]["url_score"] == 2.0
    assert out["https://casino-poker.test/slots"]["blocked"] is True
    assert out["https://news.test/poker-rules"]["url_score"] == 0.5
    assert out["https://news.test/poker-rules"]["blocked"] is False
    # 'sex' inside 'essex' is not a token hit and not in the strict list
    assert out["https://essex.edu/about"]["url_score"] == 0.0
    assert out["https://essex.edu/about"]["blocked"] is False
    assert out["https://xbadwordx.test/page"]["strict_hit"] is True
    assert out["https://xbadwordx.test/page"]["blocked"] is True
    assert out["https://clean.test/a"]["blocked"] is False


@pytest.mark.spark
def test_url_word_scores_multiplicity_and_plan(spark):
    from commoncrawl_spark.operators.blocklist import url_word_scores

    urls = spark.createDataFrame(
        [("https://poker.test/poker/poker",)], "url string")
    out = url_word_scores(urls, {"poker": 0.5}, threshold=10.0)
    assert out.collect()[0]["url_score"] == 1.5  # counts every occurrence
    plan = out._jdf.queryExecution().executedPlan().toString()
    # literal-map fold: no join, no shuffle, no Python anywhere
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
