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
