"""Dedup window (A2) == pairwise-fold oracle; canonicalization (A1) parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.functions.urls import (
    canonicalize_udf,
    canonicalize_url_col,
    canonicalize_url_py,
)
from commoncrawl_spark.operators.dedup import (
    best_capture_per_url,
    dedup_first_seen,
    deduplicate_records_py,
    merge_incremental,
)

URL_CASES = [
    "https://www.example-news.test/world/2020/jan/02/story-1/",
    "http://Example-News.test/world/2020/jan/02/story-1",
    "https://site-01.test/a/b?q=1#frag",
    "https://site-01.test:8080/a/b/",
    "https://site-01.test",
    "not a url at all",
    "example.com/Path/",
    "https://xn--bcher-kva.test/x",
]


@pytest.mark.spark
def test_canonicalize_native_matches_python_oracle(spark):
    df = spark.createDataFrame([(u,) for u in URL_CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url_col(F.col("url"))).collect()]
    want = [canonicalize_url_py(u) for u in URL_CASES]
    assert got == want


@pytest.mark.spark
def test_canonicalize_udf_punycode(spark):
    df = spark.createDataFrame([("https://www.bücher.test/x/",)], ["url"])
    got = df.select(canonicalize_udf(F.col("url"))).collect()[0][0]
    assert got == "xn--bcher-kva.test/x"
    # ascii urls agree with the native column
    df2 = spark.createDataFrame([(u,) for u in URL_CASES if u.isascii()], ["url"])
    native = [r[0] for r in df2.select(canonicalize_url_col(F.col("url"))).collect()]
    udf = [r[0] for r in df2.select(canonicalize_udf(F.col("url"))).collect()]
    assert native == udf


@pytest.mark.spark
def test_best_capture_matches_fold_oracle(spark, fixture_dir):
    cdx = spark.read.parquet(f"{fixture_dir}/cdx.parquet")
    got = {
        r["canon_url"]: (r["timestamp"], r["digest"])
        for r in best_capture_per_url(cdx).select("canon_url", "timestamp", "digest").collect()
    }

    pdf = pd.read_parquet(f"{fixture_dir}/cdx.parquet")
    records = pdf.sort_values(["crawl", "page", "line_no"]).to_dict("records")
    oracle = deduplicate_records_py(records, canonicalize_url_py)
    want = {k: (v["timestamp"], v["digest"]) for k, v in oracle.items()}

    assert got == want


@pytest.mark.spark
def test_best_capture_criteria_order(spark):
    rows = [
        # (url, status, mime_detected, length, timestamp, crawl, page, line_no, digest)
        ("https://a.test/x", "404", "text/html", "99999", "20250101000000", "c1", 0, 0, "losr1"),
        ("https://a.test/x", "200", "application/pdf", "10", "20100101000000", "c1", 0, 1, "win1"),
        ("https://b.test/x", "200", "application/pdf", "500", "20200101000000", "c1", 0, 2, "losr2"),
        ("https://b.test/x", "200", "text/html", "10", "20100101000000", "c1", 0, 3, "win2"),
        ("https://c.test/x", "200", "text/html", "10", "20200101000000", "c1", 0, 4, "losr3"),
        ("https://c.test/x", "200", "text/html", "900", "20100101000000", "c1", 0, 5, "win3"),
        ("https://d.test/x", "200", "text/html", "10", "20100101000000", "c1", 0, 6, "losr4"),
        ("https://d.test/x", "200", "text/html", "10", "20200101000000", "c1", 0, 7, "win4"),
        ("https://e.test/x", "200", "text/html", "10", "20200101000000", "c1", 0, 8, "win5"),
        ("https://e.test/x", "200", "text/html", "10", "20200101000000", "c1", 0, 9, "losr5"),
    ]
    cols = ["url", "status", "mime_detected", "length", "timestamp",
            "crawl", "page", "line_no", "digest"]
    df = spark.createDataFrame(rows, cols)
    got = {r["canon_url"]: r["digest"] for r in best_capture_per_url(df).collect()}
    assert got == {
        "a.test/x": "win1",  # status 200 beats all
        "b.test/x": "win2",  # html beats pdf
        "c.test/x": "win3",  # larger length
        "d.test/x": "win4",  # later timestamp
        "e.test/x": "win5",  # full tie -> first seen
    }


@pytest.mark.spark
def test_dedup_first_seen(spark):
    rows = [(1, "a", 2, "second"), (1, "a", 1, "first"), (2, "b", 5, "only")]
    df = spark.createDataFrame(rows, ["k1", "k2", "seq", "val"])
    got = {(r["k1"], r["k2"]): r["val"]
           for r in dedup_first_seen(df, ["k1", "k2"], ["seq"]).collect()}
    assert got == {(1, "a"): "first", (2, "b"): "only"}


@pytest.mark.spark
def test_merge_incremental_equals_global_dedup(spark, fixture_dir):
    """A4: folding batches through merge_incremental == one-shot dedup."""
    cdx = spark.read.parquet(f"{fixture_dir}/cdx.parquet")
    b1 = cdx.filter(F.col("crawl") <= "CC-MAIN-2021-21")
    b2 = cdx.filter(F.col("crawl") > "CC-MAIN-2021-21")
    folded = merge_incremental(best_capture_per_url(b1).drop("canon_url"), b2)
    oneshot = best_capture_per_url(cdx)
    key = ["canon_url", "timestamp", "digest"]
    assert sorted(map(tuple, folded.select(key).collect())) == sorted(
        map(tuple, oneshot.select(key).collect())
    )


@pytest.mark.spark
def test_containment_join_finds_quote_jaccard_misses(spark):
    """A short quote inside a long article: containment 1.0 though
    Jaccard ~0.1 — the pair set_similarity_join(0.8) cannot return."""
    from commoncrawl_spark.operators.text_dedup import (
        containment_join, set_similarity_join,
    )

    quote = ("the quick brown fox jumps over the lazy dog near the "
             "river bank today")
    article = quote + " " + " ".join(
        f"word{i} extra{i} pad{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, "nothing shared here at all "
                                       "with anything else truly")],
        "doc_id long, text string")
    got = [(r["a"], r["b"], r["containment"])
           for r in containment_join(df, threshold=0.9).collect()]
    assert got == [(1, 2, 1.0)]
    assert set_similarity_join(df, threshold=0.8).count() == 0


@pytest.mark.spark
def test_containment_join_mutual_for_near_identical(spark):
    """Near-identical docs contain each other: both directions."""
    from commoncrawl_spark.operators.text_dedup import containment_join

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, t), (2, t + " lambda")], "doc_id long, text string")
    pairs = {(r["a"], r["b"]) for r in
             containment_join(df, threshold=0.8).collect()}
    assert (1, 2) in pairs and (2, 1) in pairs
    with pytest.raises(ValueError, match="threshold"):
        containment_join(df, threshold=0.0)


@pytest.mark.spark
def test_containment_join_exactness_vs_bruteforce(spark):
    """Prefix filtering must lose nothing: compare against the n^2
    containment over a random corpus with planted excerpts."""
    import random

    from commoncrawl_spark.operators.text_dedup import containment_join

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(60)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(25)]
    docs += [(100 + i, " ".join(docs[i][1].split()[:18]))
             for i in range(0, 25, 5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in
           containment_join(df, threshold=0.85).collect()}

    from commoncrawl_spark.operators.text_dedup import shingles_col
    from pyspark.sql import functions as F
    sh = {r["doc_id"]: set(r["s"]) for r in df.select(
        "doc_id", shingles_col(F.col("text")).alias("s")).collect()}
    want = set()
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a != b and sa and round(len(sa & sb) / len(sa), 6) >= 0.85:
                want.add((a, b))
    assert got == want


@pytest.mark.spark
def test_lsh_banding_plan_scurve(spark):
    from commoncrawl_spark.operators.text_dedup import lsh_banding_plan

    rows = {r["bands"]: r
            for r in lsh_banding_plan(spark, 16, 0.8).collect()}
    assert set(rows) == {1, 2, 4, 8, 16}
    # S-curve monotonicity: collision prob rises with jaccard
    for b, r in rows.items():
        assert r["p_below"] <= r["p_at_threshold"] <= r["p_above"]
    # the exact closed form at (bands=4, rows=4, s=0.8)
    want = 1 - (1 - 0.8 ** 4) ** 4
    assert rows[4]["p_at_threshold"] == round(want, 6)
    # knee = (1/b)^(1/r)
    assert rows[4]["knee"] == round((1 / 4) ** (1 / 4), 6)


# ---------------------------------------------------------------------------
# fuzzy (MinHash) benchmark contamination
# ---------------------------------------------------------------------------


@pytest.mark.spark
def test_minhash_contamination_flags_exact_and_truncated(spark):
    from commoncrawl_spark.operators.text_dedup import minhash_contamination

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "completely unrelated text about spark shuffle partitions"),
         (3, "another benign document mentioning nothing evaluated")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        # item 10 = doc 1 verbatim; item 11 = doc 1 truncated (fuzzy)
        [(10, "the quick brown fox jumps over the lazy dog again and again"),
         (11, "the quick brown fox jumps over the lazy dog"),
         (12, "entirely disjoint benchmark question text here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in minhash_contamination(
               corpus, bench, threshold=0.5).collect()}
    assert set(got) == {1}
    assert got[1]["n_bench_matches"] >= 1
    assert got[1]["max_est_jaccard"] == 1.0  # the verbatim copy


@pytest.mark.spark
def test_minhash_contamination_no_self_exclusion(spark):
    from commoncrawl_spark.operators.text_dedup import minhash_contamination

    # corpus id 5 == bench id 5, byte-identical text: MUST be flagged
    txt = "shared evaluation passage that leaked into the crawl corpus"
    corpus = spark.createDataFrame([(5, txt)], "doc_id long, text string")
    bench = spark.createDataFrame([(5, txt)], "doc_id long, text string")
    rows = minhash_contamination(corpus, bench).collect()
    assert len(rows) == 1 and rows[0]["max_est_jaccard"] == 1.0


@pytest.mark.spark
def test_minhash_contamination_threshold_validation(spark):
    from commoncrawl_spark.operators.text_dedup import minhash_contamination

    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_contamination(df, df, threshold=0.0)
