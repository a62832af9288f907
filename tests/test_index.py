"""Inverted index: postings build, conjunctive retrieval, the max_df
ubiquity cap, and agreement between the indexed and scan paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.index import (
    build_postings,
    conjunctive_search,
    search_postings,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "spark join hash"), (2, "spark join"), (3, "hash only here"),
         (4, "spark hash join extras")],
        "doc_id long, text string").cache()


@pytest.mark.spark
def test_postings_structure(spark, corpus):
    rows = {r["token"]: r for r in build_postings(corpus).collect()}
    assert rows["spark"]["df"] == 3
    assert rows["spark"]["doc_ids"] == [1, 2, 4]  # sorted
    assert rows["only"]["doc_ids"] == [3]


@pytest.mark.spark
def test_search_paths_agree(spark, corpus):
    post = build_postings(corpus)
    a = {r["doc_id"]
         for r in search_postings(post, ["spark", "join", "hash"]).collect()}
    b = {r["doc_id"]
         for r in conjunctive_search(
             corpus, ["spark", "join", "hash"]).collect()}
    assert a == b == {1, 4}
    # duplicate query terms must not change semantics
    c = {r["doc_id"]
         for r in search_postings(post, ["spark", "spark", "join"]).collect()}
    assert c == {1, 2, 4}


@pytest.mark.spark
def test_max_df_drops_ubiquitous_terms(spark, corpus):
    post = build_postings(corpus, max_df=2)
    toks = {r["token"] for r in post.collect()}
    assert "spark" not in toks and "hash" not in toks  # df=3 each
    assert "only" in toks


@pytest.mark.spark
def test_conjunctive_scan_has_no_shuffle(spark, corpus):
    plan = (conjunctive_search(corpus, ["spark"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan


@pytest.mark.spark
def test_search_ignores_terms_dropped_by_max_df(spark, corpus):
    """A query term that max_df removed from the index must not empty
    the result — ubiquitous terms filter nothing; a query of ONLY
    dropped terms returns empty."""
    post = build_postings(corpus, max_df=2)  # drops spark/join/hash (df=3)
    got = {r["doc_id"]
           for r in search_postings(post, ["spark", "only"]).collect()}
    assert got == {3}  # == search for 'only' alone
    assert search_postings(post, ["spark", "hash"]).count() == 0


@pytest.mark.spark
def test_phrase_search_semantics(spark):
    """Consecutive-only matching, multiple occurrences counted,
    repeated phrase terms handled per slot, scrambled order rejected."""
    from commoncrawl_spark.operators.index import phrase_search

    df = spark.createDataFrame(
        [(1, "a quick fox and a quick fox again"),
         (2, "quick a fox"),               # right words, wrong order
         (3, "a quick brown fox"),         # gap breaks the phrase
         (4, "the the end")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(df, ["a", "quick", "fox"]).collect()}
    assert got == {1: 2}
    # repeated term in the phrase: slots are independent
    got2 = {r["doc_id"]: r["n_matches"]
            for r in phrase_search(df, ["the", "the"]).collect()}
    assert got2 == {4: 1}


@pytest.mark.spark
def test_phrase_search_plan_no_selfjoin(spark):
    from commoncrawl_spark.operators.index import phrase_search

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    plan = (phrase_search(df, ["x", "y"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "EvalPython" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


@pytest.mark.spark
def test_bm25_ranking_semantics(spark):
    """BM25: matching more query terms and higher tf outranks; length
    normalization penalizes padded docs; hand-checked against the
    formula."""
    import math

    from commoncrawl_spark.operators.index import bm25_search

    df = spark.createDataFrame(
        [(1, "spark spark join"),      # tf(spark)=2 + join
         (2, "spark other words here"),
         (3, "spark " + "pad " * 40),  # long doc: normalized down
         (4, "nothing relevant")],
        "doc_id long, text string")
    rows = bm25_search(df, ["spark", "join"], top_k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert 4 not in ranks                 # no matching term, no row
    assert ranks[1] == 1                  # both terms, highest tf
    assert scores[2] > scores[3]          # same tf, shorter doc wins
    # hand-check doc 2's single-term score: N and avgdl cover ALL
    # documents (including non-matching doc 4), df('spark') = 3
    n, dl, avgdl = 4.0, 4.0, (3 + 4 + 41 + 2) / 4
    idf = math.log(1.0 + (n - 3 + 0.5) / (3 + 0.5))
    expect = idf * (1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    assert scores[2] == round(expect, 6)
