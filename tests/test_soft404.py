"""Soft-404 detection: content classifier + probe-similarity path."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from commoncrawl_spark.operators.soft404 import (
    detect_soft404,
    soft404_by_probe,
)

ERROR_BODY = (
    "404 page not found. The page you requested does not exist or is "
    "no longer available. Please check the address and try again."
)
REAL_BODY = (
    "The committee published its annual report on water infrastructure "
    "spending, noting that maintenance budgets grew for the third year "
    "in a row while new construction slowed across every region. "
) * 4


def test_classifier_flags_error_page_and_keeps_article(spark):
    df = spark.createDataFrame([
        Row(url="https://a.test/missing", title="404 Not Found",
            text=ERROR_BODY),
        Row(url="https://a.test/story", title="Annual water report",
            text=REAL_BODY),
    ])
    out = {r["url"]: r for r in detect_soft404(df).collect()}
    bad, good = out["https://a.test/missing"], out["https://a.test/story"]
    assert bad["is_soft404"] and bad["title_err"] == 1
    assert bad["err_hits"] >= 3 and bad["n_tokens"] < 40
    assert not good["is_soft404"] and good["soft404_score"] == 0.0


def test_classifier_mention_of_404_in_long_article_survives(spark):
    # A news story ABOUT dead links: one error phrase, long body,
    # clean title -> score 0.25 < 0.6 threshold.
    df = spark.createDataFrame([
        Row(url="u", title="The web is rotting",
            text=("Researchers measured how often links return "
                  "page not found answers. ") + REAL_BODY),
    ])
    row = detect_soft404(df).collect()[0]
    assert row["err_hits"] == 1 and not row["is_soft404"]
    assert row["soft404_score"] == 0.25


def test_classifier_null_text_and_title(spark):
    df = spark.createDataFrame(
        [Row(url="u", title=None, text=None)],
        "url string, title string, text string")
    row = detect_soft404(df).collect()[0]
    # Empty body is "short" but has no phrases: 0.2 < threshold.
    assert row["err_hits"] == 0 and row["n_tokens"] == 0
    assert row["soft404_score"] == 0.2 and not row["is_soft404"]


def test_probe_similarity_flags_near_identical_body(spark):
    probe = ERROR_BODY + " Requested: /zz-probe-8173"
    pages = spark.createDataFrame([
        # same template, different requested path -> near-identical
        Row(host="a.test", url="https://a.test/gone",
            text=ERROR_BODY + " Requested: /old-page"),
        Row(host="a.test", url="https://a.test/story", text=REAL_BODY),
        # host with no probe row -> null jaccard, never flagged
        Row(host="b.test", url="https://b.test/x", text=ERROR_BODY),
    ])
    probes = spark.createDataFrame([Row(host="a.test", probe_text=probe)])
    out = {r["url"]: r for r in
           soft404_by_probe(pages, probes, sim_threshold=0.8).collect()}
    assert out["https://a.test/gone"]["is_soft404"]
    assert out["https://a.test/gone"]["probe_jaccard"] >= 0.8
    assert not out["https://a.test/story"]["is_soft404"]
    assert out["https://a.test/story"]["probe_jaccard"] < 0.1
    b = out["https://b.test/x"]
    assert b["probe_jaccard"] is None and not b["is_soft404"]


def test_probe_join_is_broadcast_and_row_preserving(spark):
    pages = spark.createDataFrame(
        [Row(host=f"h{i % 3}.test", url=f"https://h{i % 3}.test/{i}",
             text=f"body {i} " + REAL_BODY) for i in range(30)])
    probes = spark.createDataFrame(
        [Row(host=f"h{i}.test", probe_text=ERROR_BODY) for i in range(3)])
    out = soft404_by_probe(pages, probes)
    assert out.count() == 30  # exactly |pages| rows, never a blowup
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_classifier_is_pure_scan_stage(spark):
    df = spark.createDataFrame([Row(url="u", title="t", text="x")])
    plan = detect_soft404(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
