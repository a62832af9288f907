"""Regression tests for review findings: NULL propagation parity between
implementation pairs, regex-safe keywords, partitioning-stable sampling,
and the NULL-length dedup convention."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.functions.text import language_id_col
from commoncrawl_spark.functions.urls import canonicalize_urls_series
from commoncrawl_spark.operators.analytics import keyword_filter, sample_exact
from commoncrawl_spark.operators.dedup import (
    best_capture_per_url,
    choose_better_record_py,
)
from commoncrawl_spark.operators.text_dedup import simhash_col


def test_canonicalize_series_preserves_null():
    out = canonicalize_urls_series(
        pd.Series(["https://www.a.test/x/", None, "https://b.test/y"])
    )
    assert out[0] == "a.test/x"
    assert out[1] is None  # NULL in -> NULL out, like the Catalyst path
    assert out[2] == "b.test/y"


def test_choose_better_none_length_is_zero():
    # SQL-NULL length == missing == 0 (engine convention); a parseable
    # length on the newcomer wins even with an older timestamp
    old = {"status": "200", "mime_detected": "text/html", "length": None,
           "timestamp": "20240101000000", "url": "u"}
    new = {"status": "200", "mime_detected": "text/html", "length": "5",
           "timestamp": "20230101000000", "url": "u"}
    assert choose_better_record_py(old, new) is new


@pytest.mark.spark
def test_engine_matches_python_oracle_on_null_length(spark):
    rows = [
        ("https://h.test/a", "CC-1", 0, 0, "200", "text/html", None, "20240101000000"),
        ("https://h.test/a", "CC-1", 0, 1, "200", "text/html", "5", "20230101000000"),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, crawl string, page int, line_no int, status string, "
        "mime_detected string, length string, timestamp string",
    )
    w = best_capture_per_url(df).first()
    assert w["length"] == "5"  # engine agrees with the python oracle


@pytest.mark.spark
def test_null_text_language_and_simhash(spark):
    df = spark.createDataFrame([(0, None), (1, "")],
                               "doc_id long, text string")
    got = df.select(
        "doc_id",
        language_id_col(F.col("text")).alias("lang"),
        simhash_col(F.col("text")).alias("sim"),
    ).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[0]["lang"] == "und" and by_id[0]["sim"] is None
    assert by_id[1]["lang"] == "und" and by_id[1]["sim"] == 0


@pytest.mark.spark
def test_keyword_filter_escapes_metacharacters(spark):
    df = spark.createDataFrame(
        [(0, "i write c++ and rust"), (1, "plain prose only")],
        "doc_id long, text string",
    )
    out = keyword_filter(df, F.col("text"), include=["c++"], exclude=["(bad)"])
    got = {r["doc_id"] for r in out.collect()}
    assert got == {0}  # no regex crash; literal match semantics


@pytest.mark.spark
def test_sample_exact_stable_across_partitionings(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = {r["doc_id"] for r in sample_exact(d, 25, key_cols=["doc_id"]).collect()}
    b = {r["doc_id"] for r in
         sample_exact(d.repartition(17), 25, key_cols=["doc_id"]).collect()}
    assert a == b and len(a) == 25


@pytest.mark.spark
def test_tokenizer_udfs_ship_model_via_broadcast(spark):
    """r4 ADVICE: the trained tokenizer models must ride a
    SparkContext.broadcast (shipped once per executor), not a closure
    capture re-pickled into every task. Pin (a) a Broadcast handle in
    the factory's closure chain with the raw model absent, and (b)
    unchanged outputs through the broadcast path."""
    from pyspark.broadcast import Broadcast

    from commoncrawl_spark.operators.bpe import (
        bpe_encode_udf,
        bpe_encode_word,
    )
    from commoncrawl_spark.operators.unigram import unigram_encode_udf

    def closure_cells(fn):
        seen, out, stack = set(), [], [fn]
        while stack:
            f = stack.pop()
            if id(f) in seen or not getattr(f, "__closure__", None):
                continue
            seen.add(id(f))
            for c in f.__closure__:
                v = c.cell_contents
                out.append(v)
                if callable(v):
                    stack.append(v)
        return out

    merges = [("a", "b", 3), ("ab", "c", 2)]
    udf = bpe_encode_udf(merges)
    cells = closure_cells(udf.func)
    assert any(isinstance(v, Broadcast) for v in cells)
    assert merges not in cells and [("a", "b"), ("ab", "c")] not in cells
    df = spark.createDataFrame([(0, "abc abd xyz")], "id long, text string")
    got = df.select(udf(F.col("text")).alias("t")).first()["t"]
    want = [p for w in ["abc", "abd", "xyz"]
            for p in bpe_encode_word(w, [("a", "b"), ("ab", "c")])]
    assert got == want

    logp = {"ab": -0.5, "a": -2.0, "b": -2.0, "c": -2.0}
    uudf = unigram_encode_udf(logp, max_piece_len=2)
    ucells = closure_cells(uudf.func)
    assert any(isinstance(v, Broadcast) for v in ucells)
    assert logp not in ucells
    got_u = df.select(uudf(F.col("text")).alias("t")).first()["t"]
    # "abd"/"xyz" contain pieces missing from the vocab -> the kernel
    # falls back to per-char segmentation for those words
    assert got_u == ["ab", "c", "a", "b", "d", "x", "y", "z"]
