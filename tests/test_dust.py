"""DUST param mining: witness-group evidence, violation kills, support
threshold, repeated params, and rule application on a frontier."""

from __future__ import annotations

import pytest

from commoncrawl_spark.operators.dust import (
    mine_irrelevant_params,
    strip_irrelevant_params,
)


def _mine(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, digest string")
    return {
        (r["host"], r["param"]): r
        for r in mine_irrelevant_params(df, **kw).collect()
    }


@pytest.mark.spark
def test_session_param_mined_irrelevant_page_relevant(spark):
    rows = []
    for page in (1, 2):
        for sess in ("aa", "bb", "cc"):
            rows.append((
                f"https://shop.test/list?page={page}&session={sess}",
                f"digest-p{page}",
            ))
    got = _mine(spark, rows)
    assert got[("shop.test", "session")]["irrelevant"] is True
    assert got[("shop.test", "session")]["evidence_groups"] == 2
    assert got[("shop.test", "session")]["violation_groups"] == 0
    # page groups (fixed session, varying page) see 2 digests -> violation
    assert got[("shop.test", "page")]["irrelevant"] is False
    assert got[("shop.test", "page")]["violation_groups"] == 3


@pytest.mark.spark
def test_min_support_blocks_single_witness(spark):
    rows = [
        ("https://a.test/x?sid=1", "d1"),
        ("https://a.test/x?sid=2", "d1"),
    ]
    assert _mine(spark, rows)[("a.test", "sid")]["irrelevant"] is False
    assert _mine(spark, rows, min_support=1)[("a.test", "sid")][
        "irrelevant"] is True


@pytest.mark.spark
def test_param_order_does_not_split_witness_groups(spark):
    rows = [
        ("https://a.test/x?a=1&b=2&sid=1", "d"),
        ("https://a.test/x?sid=2&b=2&a=1", "d"),
        ("https://a.test/y?a=1&sid=3", "d2"),
        ("https://a.test/y?sid=4&a=1", "d2"),
    ]
    r = _mine(spark, rows)[("a.test", "sid")]
    assert r["evidence_groups"] == 2 and r["irrelevant"] is True


@pytest.mark.spark
def test_repeated_param_varies_as_a_unit(spark):
    # tag appears twice; the pair {x,y} vs {x,z} is a real value change
    rows = [
        ("https://a.test/p?tag=x&tag=y", "d1"),
        ("https://a.test/p?tag=x&tag=z", "d2"),
        ("https://a.test/q?tag=x&tag=y", "d3"),
        ("https://a.test/q?tag=y&tag=x", "d3"),  # same unit, same digest
    ]
    r = _mine(spark, rows)[("a.test", "tag")]
    assert r["violation_groups"] == 1 and r["irrelevant"] is False


@pytest.mark.spark
def test_rules_are_per_host(spark):
    rows = [
        ("https://a.test/x?sid=1", "d"),
        ("https://a.test/x?sid=2", "d"),
        ("https://a.test/y?sid=1", "e"),
        ("https://a.test/y?sid=2", "e"),
        # same param name is load-bearing on b.test
        ("https://b.test/x?sid=1", "f1"),
        ("https://b.test/x?sid=2", "f2"),
    ]
    got = _mine(spark, rows)
    assert got[("a.test", "sid")]["irrelevant"] is True
    assert got[("b.test", "sid")]["irrelevant"] is False


@pytest.mark.spark
def test_strip_applies_only_mined_hosts_and_preserves_order(spark):
    rules = spark.createDataFrame(
        [("a.test", "sid", True), ("a.test", "page", False),
         ("b.test", "sid", True)],
        "host string, param string, irrelevant boolean")
    frontier = spark.createDataFrame(
        [("https://a.test/x?z=9&sid=1&page=2",),
         ("https://a.test/x?sid=1",),          # all params die -> no '?'
         ("https://www.a.test:8080/x?sid=1&k=v",),  # host normalization
         ("https://c.test/x?sid=1",),          # no rules -> unchanged
         ("https://a.test/plain",)],           # no query -> unchanged
        "url string")
    got = {r["url"]: r["url_collapsed"]
           for r in strip_irrelevant_params(frontier, rules).collect()}
    assert got["https://a.test/x?z=9&sid=1&page=2"] == \
        "https://a.test/x?z=9&page=2"
    assert got["https://a.test/x?sid=1"] == "https://a.test/x"
    assert got["https://www.a.test:8080/x?sid=1&k=v"] == \
        "https://www.a.test:8080/x?k=v"
    assert got["https://c.test/x?sid=1"] == "https://c.test/x?sid=1"
    assert got["https://a.test/plain"] == "https://a.test/plain"


@pytest.mark.spark
def test_mine_then_strip_collapses_frontier(spark):
    """End-to-end: mined rules shrink a session-id-exploded frontier to
    its true page count after collapse + distinct."""
    caps = []
    for page in range(4):
        for sess in range(5):
            caps.append((
                f"https://s.test/p?page={page}&jsessionid=s{sess}",
                f"content-{page}",
            ))
    caps_df = spark.createDataFrame(caps, "url string, digest string")
    rules = mine_irrelevant_params(caps_df)
    collapsed = strip_irrelevant_params(caps_df.select("url"), rules)
    n = collapsed.select("url_collapsed").distinct().count()
    assert n == 4
