"""Shark-search focused frontier: component arithmetic, multi-parent
argmax with deterministic ties, unscored-parent drop, anchor tokenizer
behavior, and the politeness composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.focused import (
    anchor_relevance_col,
    focused_frontier,
)

TERMS = ["data", "pipelines"]


@pytest.mark.spark
def test_potential_arithmetic_exact(spark):
    pages = spark.createDataFrame(
        [("https://p.test/a", 0.8)], "url string, relevance double")
    links = spark.createDataFrame(
        [("https://p.test/a", "https://c.test/1", "Data Pipelines!")],
        "src_url string, abs_url string, anchor string")
    r = focused_frontier(pages, links, TERMS,
                         delta=0.5, beta=0.8, gamma=0.5).collect()[0]
    # anchor hits 2/2 terms -> 1.0
    assert r["inherited"] == pytest.approx(0.5 * 0.8)
    assert r["neighborhood"] == pytest.approx(0.8 * 1.0 + 0.2 * 0.8)
    assert r["potential"] == pytest.approx(
        0.5 * r["inherited"] + 0.5 * r["neighborhood"])


@pytest.mark.spark
def test_multi_parent_takes_max_and_min_url_tie(spark):
    pages = spark.createDataFrame(
        [("https://hi.test", 1.0), ("https://lo.test", 0.1),
         ("https://hi2.test", 1.0)],
        "url string, relevance double")
    links = spark.createDataFrame(
        [("https://lo.test", "https://c.test/x", "data pipelines"),
         ("https://hi.test", "https://c.test/x", "data pipelines"),
         ("https://hi2.test", "https://c.test/x", "data pipelines")],
        "src_url string, abs_url string, anchor string")
    r = focused_frontier(pages, links, TERMS).collect()[0]
    assert r["inherited"] == pytest.approx(0.5)  # from a 1.0 parent
    # hi.test and hi2.test tie on potential -> lexicographically smaller
    assert r["best_parent"] == "https://hi.test"


@pytest.mark.spark
def test_unscored_parent_dropped_and_empty_anchor_ok(spark):
    pages = spark.createDataFrame(
        [("https://seen.test", 0.6)], "url string, relevance double")
    links = spark.createDataFrame(
        [("https://seen.test", "https://c.test/1", None),
         ("https://unseen.test", "https://c.test/2", "data")],
        "src_url string, abs_url string, anchor string")
    rows = focused_frontier(pages, links, TERMS).collect()
    assert {r["url"] for r in rows} == {"https://c.test/1"}
    assert rows[0]["neighborhood"] == pytest.approx(0.2 * 0.6)


@pytest.mark.spark
def test_anchor_relevance_tokenization(spark):
    df = spark.createDataFrame(
        [("Read our DATA, pipelines guide",),
         ("data data data",), ("nothing here",), (None,)],
        "anchor string")
    got = [r["s"] for r in df.select(
        anchor_relevance_col(F.col("anchor"), TERMS).alias("s")).collect()]
    assert got == [1.0, 0.5, 0.0, 0.0]


@pytest.mark.spark
def test_focused_scores_feed_polite_batch(spark):
    from commoncrawl_spark.operators.schedule import select_polite_batch

    pages = spark.createDataFrame(
        [("https://p.test/topic", 1.0), ("https://p.test/off", 0.0)],
        "url string, relevance double")
    links = spark.createDataFrame(
        [("https://p.test/topic", f"https://t{i % 2}.test/a{i}",
          "data pipelines" if i < 2 else "misc")
         for i in range(6)]
        + [("https://p.test/off", "https://t0.test/junk", "misc")],
        "src_url string, abs_url string, anchor string")
    scored = focused_frontier(pages, links, TERMS)
    frontier = scored.select(
        "url", F.regexp_extract("url", r"https://([^/]+)", 1).alias("host"),
        F.sha1(F.col("url")).alias("url_sha1"),
        (-F.col("potential")).alias("neg_p"))
    batch = select_polite_batch(
        frontier, budget_per_host=1, priority_cols=("neg_p", "url"))
    picked = {r["url"] for r in batch.collect()}
    # one per host, and the on-topic anchors win over 'misc'/junk
    assert picked == {"https://t0.test/a0", "https://t1.test/a1"}
