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


@pytest.mark.spark
def test_bm25_plan_has_no_window(spark, corpus):
    """VERDICT r02 #1: bm25's ranking must never contain a Window node
    (the old partition-less row_number funneled every matching doc
    through one task). Top-k is orderBy+limit; ranks come from a
    bounded array fold."""
    from commoncrawl_spark.operators.index import bm25_search

    out = bm25_search(corpus, ["spark", "hash"], top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # top-k is a real limit, not a filter on a global rank
    assert "TakeOrderedAndProject" in plan or "Limit" in plan


@pytest.mark.spark
def test_bm25_rank_values(spark, corpus):
    from commoncrawl_spark.operators.index import bm25_search

    rows = bm25_search(corpus, ["only"], top_k=5).collect()
    assert [r["rank"] for r in rows] == [1]
    assert rows[0]["doc_id"] == 3 and rows[0]["score"] > 0


@pytest.mark.spark
def test_bm25_indexed_matches_scan_path(spark, corpus, tmp_path):
    from commoncrawl_spark.operators.index import (
        bm25_search,
        bm25_search_indexed,
        build_doclen,
        build_tf_index,
    )

    build_tf_index(corpus).write.parquet(str(tmp_path / "tf"))
    build_doclen(corpus).write.parquet(str(tmp_path / "dl"))
    tf = spark.read.parquet(str(tmp_path / "tf"))
    dl = spark.read.parquet(str(tmp_path / "dl"))
    terms = ["spark", "join", "hash"]
    a = sorted(
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_search_indexed(tf, dl, terms, top_k=4).collect())
    b = sorted(
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_search(corpus, terms, top_k=4).collect())
    assert a == b and len(a) == 4


@pytest.mark.spark
def test_bm25_indexed_plan_reads_index_not_corpus(spark, corpus, tmp_path):
    """Index-once/search-many: the search plan consumes ONLY the
    persisted index tables — no corpus scan, no re-tokenization, and
    the token predicate pushes into the index's parquet scan."""
    from commoncrawl_spark.operators.index import (
        bm25_search_indexed,
        build_doclen,
        build_tf_index,
    )

    build_tf_index(corpus).write.parquet(str(tmp_path / "tf"))
    build_doclen(corpus).write.parquet(str(tmp_path / "dl"))
    tf = spark.read.parquet(str(tmp_path / "tf"))
    dl = spark.read.parquet(str(tmp_path / "dl"))
    out = bm25_search_indexed(tf, dl, ["spark", "join"], top_k=3)
    out.collect()  # finalize AQE
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus frame is a LocalTableScan in this test; the index is
    # parquet — a search that re-derived postings would show the former
    assert "LocalTableScan" not in plan
    # no tokenization in the query path (the regexp splitter lives in
    # the build, which already ran)
    assert "split" not in plan.lower()
    # token IN (...) reaches the parquet scan as a pushed filter
    assert "PushedFilters: [In(token" in plan.replace("\n", " ")
    assert "Window" not in plan


@pytest.mark.spark
def test_phrase_indexed_matches_scan_path(spark, tmp_path):
    from commoncrawl_spark.operators.index import (
        build_positional_postings,
        phrase_search,
        phrase_search_indexed,
    )

    df = spark.createDataFrame(
        [(1, "slow hash batch now"), (2, "slow hash slow hash batch"),
         (3, "hash batch slow"), (4, "slow hash batch slow hash batch")],
        "doc_id long, text string")
    build_positional_postings(df).write.parquet(str(tmp_path / "pos"))
    pos = spark.read.parquet(str(tmp_path / "pos"))
    phrase = ["slow", "hash", "batch"]
    a = sorted(
        (r["doc_id"], r["n_matches"])
        for r in phrase_search_indexed(pos, phrase).collect())
    b = sorted(
        (r["doc_id"], r["n_matches"])
        for r in phrase_search(df, phrase).collect())
    assert a == b == [(1, 1), (2, 1), (4, 2)]


@pytest.mark.spark
def test_build_doclen_counts_zero_token_docs(spark):
    from commoncrawl_spark.operators.index import build_doclen

    df = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["dl"] for r in build_doclen(df).collect()}
    assert rows == {1: 2, 2: 0, 3: 0}


@pytest.mark.spark
def test_build_tf_index_max_df(spark, corpus):
    from commoncrawl_spark.operators.index import build_tf_index

    toks = {r["token"] for r in build_tf_index(corpus, max_df=2).collect()}
    assert "spark" not in toks and "hash" not in toks  # df=3 each
    assert "only" in toks


# ---------------------------------------------------------------------------
# incremental index merge
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def segments(spark):
    """History + a new segment that re-crawls doc 2 with CHANGED text
    and adds doc 5."""
    hist = spark.createDataFrame(
        [(1, "spark join hash"), (2, "spark join"), (3, "hash only here")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "entirely rewritten page"), (5, "spark hash fresh")],
        "doc_id long, text string")
    merged_corpus = spark.createDataFrame(
        [(1, "spark join hash"), (3, "hash only here"),
         (2, "entirely rewritten page"), (5, "spark hash fresh")],
        "doc_id long, text string")
    return hist, new, merged_corpus


@pytest.mark.spark
def test_merge_tf_index_equals_rebuild(spark, segments):
    from commoncrawl_spark.operators.index import build_tf_index, merge_tf_index

    hist, new, full = segments
    merged = merge_tf_index(build_tf_index(hist), build_tf_index(new))
    rebuilt = build_tf_index(full)
    key = lambda r: (r["token"], r["doc_id"], r["tf"])
    assert sorted(map(key, merged.collect())) == \
        sorted(map(key, rebuilt.collect()))


@pytest.mark.spark
def test_merge_replaces_recrawled_doc_rows(spark, segments):
    from commoncrawl_spark.operators.index import build_tf_index, merge_tf_index

    hist, new, _ = segments
    merged = merge_tf_index(build_tf_index(hist), build_tf_index(new))
    doc2 = {r["token"] for r in merged.filter(F.col("doc_id") == 2).collect()}
    # old tokens of doc 2 are GONE, only the re-crawl's remain
    assert doc2 == {"entirely", "rewritten", "page"}


@pytest.mark.spark
def test_merge_doclen_and_bm25_agree_with_rebuild(spark, segments):
    from commoncrawl_spark.operators.index import (
        bm25_search_indexed, build_doclen, build_tf_index,
        merge_doclen, merge_tf_index)

    hist, new, full = segments
    mtf = merge_tf_index(build_tf_index(hist), build_tf_index(new))
    mdl = merge_doclen(build_doclen(hist), build_doclen(new))
    a = [(r["doc_id"], r["score"], r["rank"]) for r in
         bm25_search_indexed(mtf, mdl, ["spark", "hash"], top_k=10).collect()]
    b = [(r["doc_id"], r["score"], r["rank"]) for r in
         bm25_search_indexed(build_tf_index(full), build_doclen(full),
                             ["spark", "hash"], top_k=10).collect()]
    assert a == b and len(a) == 3


@pytest.mark.spark
def test_merge_tf_index_max_df_recheck(spark, segments):
    from commoncrawl_spark.operators.index import build_tf_index, merge_tf_index

    hist, new, full = segments
    # 'spark' df: hist 2 (docs 1,2) -> merged 2 (docs 1,5); 'hash' df 3
    merged = merge_tf_index(build_tf_index(hist), build_tf_index(new),
                            max_df=2)
    toks = {r["token"] for r in merged.collect()}
    assert "spark" in toks and "hash" not in toks


@pytest.mark.spark
def test_merge_positional_postings_phrase_parity(spark, segments):
    from commoncrawl_spark.operators.index import (
        build_positional_postings, merge_positional_postings,
        phrase_search, phrase_search_indexed)

    hist, new, full = segments
    merged = merge_positional_postings(
        build_positional_postings(hist), build_positional_postings(new))
    a = sorted((r["doc_id"], r["n_matches"]) for r in
               phrase_search_indexed(merged, ["spark", "hash"]).collect())
    b = sorted((r["doc_id"], r["n_matches"]) for r in
               phrase_search(full, ["spark", "hash"]).collect())
    assert a == b == [(5, 1)]


@pytest.mark.spark
def test_merge_broadcasts_segment_ids(spark, segments):
    from commoncrawl_spark.operators.index import build_tf_index, merge_tf_index

    hist, new, _ = segments
    merged = merge_tf_index(build_tf_index(hist), build_tf_index(new))
    merged.collect()
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # the anti-join against the slim new-id set must be a broadcast
    # (the historical index is never shuffled for the merge)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


@pytest.mark.spark
def test_proximity_search_chains(spark):
    from commoncrawl_spark.operators.index import proximity_search

    df = spark.createDataFrame([
        (1, "a x b y c"),       # gaps 2,2 within slop 2 -> match
        (2, "a b q q q c"),     # b->c gap 4 > 3 -> no match
        (3, "a a x x b c"),     # only the later 'a' starts a chain
        (4, "c b a"),           # wrong order
        (5, "a b c c"),         # two reachable end positions
    ], "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"]
           for r in proximity_search(df, ["a", "b", "c"], slop=2).collect()}
    assert got == {1: 1, 3: 1, 5: 2}


@pytest.mark.spark
def test_proximity_greedy_trap(spark):
    # the case that breaks greedy earliest-next advancing: the earlier
    # 'b' strands 'c'; only the later 'b' completes the chain
    from commoncrawl_spark.operators.index import proximity_search

    df = spark.createDataFrame(
        [(1, "a q b q b q q q c")], "doc_id long, text string")
    got = proximity_search(df, ["a", "b", "c"], slop=3).collect()
    # a@0 reaches b@2 AND b@4 (gaps 2, 4 <= 4); c@8 from b@2 is gap 6
    # (no) but from b@4 is gap 4 (yes) — greedy earliest-next would
    # stop at b@2 and miss it; the existential fold keeps both alive
    assert [(r["doc_id"], r["n_matches"]) for r in got] == [(1, 1)]


@pytest.mark.spark
def test_proximity_slop0_equals_phrase(spark):
    from commoncrawl_spark.operators.index import (
        phrase_search, proximity_search,
    )

    df = spark.createDataFrame([
        (1, "u v w z u v w"), (2, "u z v w"), (3, "w v u")],
        "doc_id long, text string")
    a = {(r["doc_id"], r["n_matches"])
         for r in proximity_search(df, ["u", "v", "w"], slop=0).collect()}
    b = {(r["doc_id"], r["n_matches"])
         for r in phrase_search(df, ["u", "v", "w"]).collect()}
    assert a == b == {(1, 2)}


@pytest.mark.spark
def test_proximity_plan_no_window_no_python(spark):
    from commoncrawl_spark.operators.index import proximity_search

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = proximity_search(df, ["a", "b"], slop=1)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Window" not in plan
    with pytest.raises(ValueError):
        proximity_search(df, [], slop=1)
    with pytest.raises(ValueError):
        proximity_search(df, ["a"], slop=-1)


@pytest.mark.spark
def test_delta_postings_hand_computed(spark):
    """ids [3, 130, 131]: gaps [127, 1]; varints 1+1+1 = 3 bytes vs
    24 raw. A 128 first_id needs 2 bytes."""
    from commoncrawl_spark.operators.index import delta_encode_postings

    p = spark.createDataFrame(
        [("a", 3, [3, 130, 131]), ("b", 1, [128])],
        "token string, df long, doc_ids array<long>")
    got = {r["token"]: r for r in delta_encode_postings(p).collect()}
    a = got["a"]
    assert (a["first_id"], list(a["gaps"])) == (3, [127, 1])
    assert (a["bytes_raw"], a["bytes_delta"]) == (24, 3)
    assert a["ratio"] == 0.125
    b = got["b"]
    assert (b["first_id"], list(b["gaps"]), b["bytes_delta"]) == (128, [], 2)


@pytest.mark.spark
def test_delta_postings_varint_boundaries(spark):
    """Exact LEB128 size at every 7-bit boundary."""
    from commoncrawl_spark.operators.index import _varint_bytes

    df = spark.createDataFrame(
        [(v,) for v in [0, 127, 128, 16383, 16384, 2097151, 2097152,
                        268435455, 268435456]], "v long")
    got = dict((r["v"], r["n"]) for r in
               df.select("v", _varint_bytes(F.col("v")).alias("n")).collect())
    assert got == {0: 1, 127: 1, 128: 2, 16383: 2, 16384: 3,
                   2097151: 3, 2097152: 4, 268435455: 4, 268435456: 5}


@pytest.mark.spark
def test_delta_postings_plan_no_shuffle_added(spark):
    from commoncrawl_spark.operators.index import delta_encode_postings

    p = spark.createDataFrame(
        [("t", 2, [1, 5])], "token string, df long, doc_ids array<long>")
    out = delta_encode_postings(p)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row arrays only
    assert "EvalPython" not in plan


@pytest.mark.spark
def test_retrieval_eval_hand_case(spark):
    import math

    from commoncrawl_spark.operators.index import retrieval_eval

    # q1: rels {d1: 3, d2: 1}; ranking [d9, d1, d2] -> first rel at 2
    results = spark.createDataFrame(
        [("q1", "d9", 1), ("q1", "d1", 2), ("q1", "d2", 3),
         ("q2", "d5", 1)],                     # q2: no relevant retrieved
        "query_id string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [("q1", "d1", 3), ("q1", "d2", 1), ("q2", "d7", 2),
         ("q3", "d8", 1)],                     # q3 never searched
        "query_id string, doc_id string, rel int")
    got = {r["query_id"]: r
           for r in retrieval_eval(results, qrels, k=3).collect()}
    q1 = got["q1"]
    assert q1["mrr"] == 0.5
    assert q1["precision_k"] == round(2 / 3, 6)
    assert q1["recall_k"] == 1.0
    dcg = (2**3 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert q1["ndcg_k"] == round(dcg / idcg, 6)
    assert got["q2"]["mrr"] == 0.0 and got["q2"]["ndcg_k"] == 0.0
    # judged-but-unsearched query surfaces as an all-zero row
    assert got["q3"]["recall_k"] == 0.0 and "q3" in got


@pytest.mark.spark
def test_retrieval_eval_grades_bm25_on_synthetic_gold(spark):
    """End-to-end: BM25 over docs where gold = docs containing the
    query term; a working ranker scores near-perfect recall@k."""
    from pyspark.sql import functions as F

    from commoncrawl_spark.operators.index import bm25_search, retrieval_eval

    docs = spark.createDataFrame(
        [(i, ("needle common words " if i % 4 == 0 else "common words only ")
          + f"filler{i}") for i in range(40)],
        "doc_id long, text string")
    res = bm25_search(docs, ["needle"], top_k=10)
    results = res.select(F.lit("q").alias("query_id"), "doc_id", "rank")
    qrels = docs.filter(F.col("text").contains("needle")).select(
        F.lit("q").alias("query_id"), "doc_id", F.lit(1).alias("rel"))
    r = retrieval_eval(results, qrels, k=10).collect()[0]
    assert r["mrr"] == 1.0 and r["recall_k"] == 1.0


# ---------------------------------------------------------------------------
# BM25F field-weighted retrieval
# ---------------------------------------------------------------------------


def _bm25f_oracle(docs, terms, weights, k1=1.2, b=0.75):
    """docs: [(id, {field: text})]; weights: [(field, w)] ordered."""
    import math

    def toks(t):
        import re
        return [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]

    dl = {}
    for did, fields in docs:
        s = 0.0
        for f, w in weights:
            s += len(toks(fields.get(f, ""))) * w
        dl[did] = s
    n = len(docs)
    avgdl = sum(dl[d] for d, _ in docs) / n
    tf = {}
    for did, fields in docs:
        for t in set(terms):
            wtf = 0.0
            for f, w in weights:
                wtf += toks(fields.get(f, "")).count(t) * w
            if wtf > 0:
                tf[(did, t)] = wtf
    dfreq = {}
    for (_d, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for did, _ in docs:
        per = []
        for t in sorted(set(terms)):
            if (did, t) not in tf:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            x = tf[(did, t)]
            per.append((t, idf * x * (k1 + 1)
                        / (x + k1 * (1 - b + b * dl[did] / avgdl))))
        if per:
            s = 0.0
            for _t, v in sorted(per):
                s += v
            scores[did] = round(s, 6)
    return scores


@pytest.mark.spark
def test_bm25f_matches_python_oracle(spark):
    from commoncrawl_spark.operators.index import bm25f_search

    docs = [
        (1, {"title": "spark join guide", "body": "hash partitions and join plans"}),
        (2, {"title": "cooking pasta", "body": "spark spark join join join hash"}),
        (3, {"title": "hash maps", "body": "no relevant words at all"}),
        (4, {"title": "", "body": "join"}),
    ]
    df = spark.createDataFrame(
        [(d, f["title"], f["body"]) for d, f in docs],
        "doc_id long, title string, body string")
    got = {r["doc_id"]: r["score"]
           for r in bm25f_search(
               df, ["spark", "join", "hash"],
               {"title": 3.0, "body": 1.0}, top_k=10).collect()}
    want = _bm25f_oracle(docs, ["spark", "join", "hash"],
                         [("title", 3.0), ("body", 1.0)])
    assert got == want


@pytest.mark.spark
def test_bm25f_title_hit_beats_body_hit(spark):
    from commoncrawl_spark.operators.index import bm25f_search

    # identical docs except WHERE the term sits; equal lengths so only
    # the field weight separates them
    df = spark.createDataFrame(
        [(1, "spark intro", "filler words here"),
         (2, "other intro", "spark words here")],
        "doc_id long, title string, body string")
    rows = {r["doc_id"]: r
            for r in bm25f_search(
                df, ["spark"], {"title": 3.0, "body": 1.0}).collect()}
    assert rows[1]["score"] > rows[2]["score"]
    assert rows[1]["rank"] == 1


@pytest.mark.spark
def test_bm25f_single_field_unit_weight_is_bm25(spark, corpus):
    from commoncrawl_spark.operators.index import bm25_search, bm25f_search

    a = {(r["doc_id"], r["score"], r["rank"])
         for r in bm25_search(corpus, ["spark", "hash"], top_k=4).collect()}
    f = {(r["doc_id"], r["score"], r["rank"])
         for r in bm25f_search(
             corpus, ["spark", "hash"], {"text": 1.0}, top_k=4).collect()}
    assert a == f


@pytest.mark.spark
def test_bm25f_validation(spark, corpus):
    from commoncrawl_spark.operators.index import bm25f_search

    with pytest.raises(ValueError):
        bm25f_search(corpus, [], {"text": 1.0})
    with pytest.raises(ValueError):
        bm25f_search(corpus, ["spark"], {})
    with pytest.raises(ValueError):
        bm25f_search(corpus, ["spark"], {"text": 0.0})


# ---------------------------------------------------------------------------
# Champion lists (static index pruning)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def champ_corpus(spark):
    # 'common' appears in every doc with distinct tfs; 'rare' in two
    rows = []
    for i in range(1, 9):
        rows.append((i, " ".join(["common"] * i)
                     + (" rare" if i in (3, 7) else "")))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.mark.spark
def test_champion_lists_keep_top_m_by_tf(spark, champ_corpus):
    from commoncrawl_spark.operators.index import (
        build_champion_lists, build_tf_index)

    champ = build_champion_lists(
        build_tf_index(champ_corpus), m=3, salt_buckets=4)
    rows = [r for r in champ.collect() if r["token"] == "common"]
    # top-3 postings by tf desc: docs 8, 7, 6
    assert sorted(r["doc_id"] for r in rows) == [6, 7, 8]
    # TRUE df stamped, not the pruned list length
    assert all(r["df"] == 8 for r in rows)
    rare = [r for r in champ.collect() if r["token"] == "rare"]
    assert sorted(r["doc_id"] for r in rare) == [3, 7]


@pytest.mark.spark
def test_champion_ties_break_on_id(spark):
    from commoncrawl_spark.operators.index import (
        build_champion_lists, build_tf_index)

    df = spark.createDataFrame(
        [(i, "tie tie") for i in range(1, 6)], "doc_id long, text string")
    champ = build_champion_lists(build_tf_index(df), m=2, salt_buckets=4)
    assert sorted(r["doc_id"] for r in champ.collect()) == [1, 2]


@pytest.mark.spark
def test_champion_search_equals_full_when_m_large(spark, champ_corpus):
    from commoncrawl_spark.operators.index import (
        bm25_search_champion, bm25_search_indexed, build_champion_lists,
        build_doclen, build_tf_index)

    tfi = build_tf_index(champ_corpus)
    dl = build_doclen(champ_corpus)
    full = {(r["doc_id"], r["score"], r["rank"])
            for r in bm25_search_indexed(
                tfi, dl, ["common", "rare"], top_k=8).collect()}
    pruned = {(r["doc_id"], r["score"], r["rank"])
              for r in bm25_search_champion(
                  build_champion_lists(tfi, m=100), dl,
                  ["common", "rare"], top_k=8).collect()}
    assert full == pruned


@pytest.mark.spark
def test_champion_search_scores_survivors_exactly(spark, champ_corpus):
    from commoncrawl_spark.operators.index import (
        bm25_search_champion, bm25_search_indexed, build_champion_lists,
        build_doclen, build_tf_index)

    tfi = build_tf_index(champ_corpus)
    dl = build_doclen(champ_corpus)
    full = {r["doc_id"]: r["score"]
            for r in bm25_search_indexed(
                tfi, dl, ["common"], top_k=8).collect()}
    got = {r["doc_id"]: r["score"]
           for r in bm25_search_champion(
               build_champion_lists(tfi, m=3), dl,
               ["common"], top_k=8).collect()}
    # only the tf-top-3 candidates are reachable (the documented
    # approximation: tf-pruning, not score-pruning — doc 5 outscores
    # doc 7 in the full ranking because 'rare' pads 7's length, but 5
    # is outside the champion list), each scored EXACTLY as full
    assert sorted(got) == [6, 7, 8]
    for d, s in got.items():
        assert s == full[d]


@pytest.mark.spark
def test_champion_validation(spark, champ_corpus):
    from commoncrawl_spark.operators.index import (
        build_champion_lists, build_tf_index)

    with pytest.raises(ValueError):
        build_champion_lists(build_tf_index(champ_corpus), m=0)



# ---------------------------------------------------------------------------
# tombstone-aware indexed search (index deletes without rewrites)
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_tombstoned_equals_fresh_index_of_survivors(spark):
    from commoncrawl_spark.operators.index import (
        bm25_search,
        bm25_search_tombstoned,
        build_doclen,
        build_tf_index,
    )

    docs = spark.createDataFrame(
        [(1, "spark join hash"), (2, "spark join"), (3, "hash only"),
         (4, "spark hash join extra words"), (5, "join join join")],
        "doc_id long, text string")
    tf, dl = build_tf_index(docs), build_doclen(docs)
    dead = spark.createDataFrame([(2,), (5,)], "doc_id long")
    got = sorted(
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_search_tombstoned(
            tf, dl, dead, ["spark", "join"], top_k=5).collect())
    want = sorted(
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_search(
            docs.filter(~F.col("doc_id").isin(2, 5)),
            ["spark", "join"], top_k=5).collect())
    assert got == want and got                 # exact-stat contract
    assert all(d not in (2, 5) for d, _, _ in got)


@pytest.mark.spark
def test_tombstoned_stale_stats_requires_df_and_excludes_dead(spark):
    from commoncrawl_spark.operators.index import (
        bm25_search_tombstoned,
        build_doclen,
        build_tf_index,
    )

    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "spark"), (3, "join spark")],
        "doc_id long, text string")
    tf, dl = build_tf_index(docs), build_doclen(docs)
    dead = spark.createDataFrame([(2,)], "doc_id long")
    with pytest.raises(ValueError, match="df column"):
        bm25_search_tombstoned(tf, dl, dead, ["spark"], stale_stats=True)
    # stamp build-time df on; stale mode serves pre-delete stats but
    # never a deleted doc
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    tf_df = tf.join(dfreq, "token")
    rows = bm25_search_tombstoned(
        tf_df, dl, dead, ["spark"], stale_stats=True, top_k=5).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 3]
    exact = bm25_search_tombstoned(
        tf, dl, dead, ["spark"], top_k=5).collect()
    # stale idf uses df=3 (pre-delete), exact uses df=2: scores differ
    assert {r["score"] for r in rows} != {r["score"] for r in exact}


@pytest.mark.spark
def test_tombstoned_plan_anti_join_no_window(spark):
    from commoncrawl_spark.operators.index import (
        bm25_search_tombstoned,
        build_doclen,
        build_tf_index,
    )
    from commoncrawl_spark.plans.explain import plan_string

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    dead = spark.createDataFrame([(9,)], "doc_id long")
    p = plan_string(bm25_search_tombstoned(
        build_tf_index(docs), build_doclen(docs), dead, ["a"]), "simple")
    assert "LeftAnti" in p and "Window" not in p and "EvalPython" not in p


# ---------------------------------------------------------------------------
# Block-Max pruning
# ---------------------------------------------------------------------------

def _bm_corpus(spark, n=240):
    # docs 0..n-1; ids >= 128 are low-signal (terms appear once in long
    # docs), ids < 128 carry the high-tf matches -> the high docID
    # blocks become skippable once theta is known.
    rows = []
    for i in range(n):
        if i < 64:
            text = "join " * 5 + "hash " * 3 + "filler " * 10
        elif i < 128:
            text = "join hash " + "pad " * 30
        else:
            text = ("join " if i % 3 == 0 else "") + "unrelated " * 60
        rows.append((i, text.strip()))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
def test_blockmax_equals_full_index_ranking(spark):
    from commoncrawl_spark.operators.index import (
        bm25_search_blockmax, bm25_search_indexed, build_doclen,
        build_tf_index)
    d = _bm_corpus(spark)
    tf, dl = build_tf_index(d), build_doclen(d)
    full = bm25_search_indexed(tf, dl, ["join", "hash"], top_k=10).collect()
    pruned = bm25_search_blockmax(
        tf, dl, ["join", "hash"], champion_m=16, block_span=64,
        top_k=10).collect()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in full] == \
           [(r["doc_id"], r["score"], r["rank"]) for r in pruned]


@pytest.mark.spark
def test_blockmax_ub_is_true_upper_bound(spark):
    from commoncrawl_spark.operators.index import (
        build_block_max, build_doclen, build_tf_index)
    d = _bm_corpus(spark, n=120)
    tf, dl = build_tf_index(d), build_doclen(d)
    bm = {(r["token"], r["block_id"]): r["ub"]
          for r in build_block_max(tf, dl, block_span=32).collect()}
    # recompute every posting's score the slow way and compare
    from commoncrawl_spark.operators.index import bm25_search_indexed
    import math
    rows = tf.collect()
    dls = {r["doc_id"]: r["dl"] for r in build_doclen(d).collect()}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    dfc = {}
    for r in rows:
        dfc[r["token"]] = dfc.get(r["token"], 0) + 1
    for r in rows:
        idf = math.log(1.0 + (n - dfc[r["token"]] + 0.5)
                       / (dfc[r["token"]] + 0.5))
        s = idf * (r["tf"] * 2.2
                   / (r["tf"] + 1.2 * (0.25 + 0.75 * dls[r["doc_id"]]
                                       / avgdl)))
        assert s <= bm[(r["token"], r["doc_id"] // 32)] + 1e-9


@pytest.mark.spark
def test_blockmax_actually_skips_regions(spark):
    from commoncrawl_spark.operators.index import (
        blockmax_region_plan, bm25_search_champion, build_block_max,
        build_champion_lists, build_doclen, build_tf_index)
    d = _bm_corpus(spark)
    tf, dl = build_tf_index(d), build_doclen(d)
    champs = build_champion_lists(tf, m=16)
    theta = bm25_search_champion(
        champs, dl, ["join", "hash"], top_k=10).agg(
        F.min("score").alias("theta"))
    plan = blockmax_region_plan(
        build_block_max(tf, dl, block_span=64), ["join", "hash"], theta)
    verdicts = {r["block_id"]: r["skippable"] for r in plan.collect()}
    assert verdicts[0] is False          # the high-tf region survives
    assert any(verdicts.values())        # and something IS skipped


@pytest.mark.spark
def test_blockmax_plan_hygiene(spark):
    from commoncrawl_spark.operators.index import (
        bm25_search_blockmax, build_doclen, build_tf_index)
    d = _bm_corpus(spark, n=60)
    tf, dl = build_tf_index(d), build_doclen(d)
    out = bm25_search_blockmax(tf, dl, ["join", "hash"], top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import sys
    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    from scripts.plan_audit import partitionless_windows
    assert partitionless_windows(plan) == []
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


@pytest.mark.spark
def test_blockmax_unknown_terms_empty_not_crash(spark):
    from commoncrawl_spark.operators.index import (
        bm25_search_blockmax, build_doclen, build_tf_index)
    d = _bm_corpus(spark, n=30)
    tf, dl = build_tf_index(d), build_doclen(d)
    assert bm25_search_blockmax(tf, dl, ["zzz"], top_k=5).count() == 0


@pytest.mark.spark
def test_blockmax_underfilled_champion_still_equals_full(spark):
    # fewer matching docs than top_k: theta must fall back to -inf
    # (the champion min is NOT a kth-score lower bound there), so the
    # pruned path degenerates to the full search and stays exact.
    from commoncrawl_spark.operators.index import (
        bm25_search_blockmax, bm25_search_indexed, build_doclen,
        build_tf_index)
    d = spark.createDataFrame(
        [(i, "join pad" if i % 2 else "other text") for i in range(8)],
        "doc_id long, text string")
    tf, dl = build_tf_index(d), build_doclen(d)
    full = bm25_search_indexed(tf, dl, ["join"], top_k=10).collect()
    pruned = bm25_search_blockmax(tf, dl, ["join"], top_k=10,
                                  champion_m=2, block_span=4).collect()
    assert [(r["doc_id"], r["score"]) for r in full] == \
           [(r["doc_id"], r["score"]) for r in pruned]


# ---------------------------------------------------------------------------
# percolation
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_percolate_all_and_any_modes(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.index import percolate
    docs = spark.createDataFrame(
        [(1, "spark join hash join"), (2, "spark only"), (3, "other")],
        "doc_id long, text string")
    qs = spark.createDataFrame([
        Row(query_id="q_both", terms=["spark", "join"]),
        Row(query_id="q_spark", terms=["spark"]),
        Row(query_id="q_none", terms=["zzz"]),
    ])
    allm = {(r["doc_id"], r["query_id"])
            for r in percolate(docs, qs).collect()}
    assert allm == {(1, "q_both"), (1, "q_spark"), (2, "q_spark")}
    anym = {(r["doc_id"], r["query_id"])
            for r in percolate(docs, qs, mode="any").collect()}
    assert (2, "q_both") in anym  # one of two terms suffices
    assert not any(q == "q_none" for _, q in anym)


@pytest.mark.spark
def test_percolate_dup_terms_and_dup_tokens_count_once(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.index import percolate
    docs = spark.createDataFrame(
        [(1, "join join join hash")], "doc_id long, text string")
    qs = spark.createDataFrame(
        [Row(query_id="q", terms=["join", "join", "hash"])])
    row = percolate(docs, qs).collect()[0]
    assert (row["n_matched"], row["n_terms"]) == (2, 2)


@pytest.mark.spark
def test_percolate_mode_validation_and_plan(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.index import percolate
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    qs = spark.createDataFrame([Row(query_id="q", terms=["a"])])
    with pytest.raises(ValueError):
        percolate(docs, qs, mode="sometimes")
    plan = percolate(docs, qs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


@pytest.mark.spark
def test_blockmax_with_dl_column_matches_join_path(spark):
    from commoncrawl_spark.operators.index import (
        build_block_max, build_doclen, build_tf_index)
    d = _bm_corpus(spark, n=120)
    dl = build_doclen(d)
    a = {(r["token"], r["block_id"]): (r["n_postings"], r["ub"])
         for r in build_block_max(build_tf_index(d), dl,
                                  block_span=32).collect()}
    b = {(r["token"], r["block_id"]): (r["n_postings"], r["ub"])
         for r in build_block_max(build_tf_index(d, with_dl=True), dl,
                                  block_span=32).collect()}
    assert a == b
    # and the with_dl plan has no id-key join of the postings stream
    p = build_block_max(build_tf_index(d, with_dl=True), dl,
                        block_span=32)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin [doc_id" not in p


@pytest.mark.spark
def test_blockmax_missing_block_metadata_is_conservative(spark):
    # block_max rows for some regions are absent (e.g. a segment whose
    # metadata was not merged yet): those regions must be KEPT
    # (anti-join against skippable), so the pruned ranking still
    # equals the full one. Stats (n/avgdl/df) are unchanged here —
    # stale STATS require a metadata rebuild, which the docstring
    # makes a requirement, not a recoverable condition.
    from pyspark.sql import functions as F
    from commoncrawl_spark.operators.index import (
        bm25_search_blockmax, bm25_search_indexed, build_block_max,
        build_doclen, build_tf_index)
    d = _bm_corpus(spark, n=240)
    tf, dl = build_tf_index(d), build_doclen(d)
    holey = build_block_max(tf, dl, block_span=64).filter(
        F.col("block_id") < 2)  # blocks 2,3 missing entirely
    full = bm25_search_indexed(tf, dl, ["join", "hash"],
                               top_k=10).collect()
    pruned = bm25_search_blockmax(
        tf, dl, ["join", "hash"], champion_m=16, block_span=64,
        top_k=10, block_max=holey).collect()
    assert [(r["doc_id"], r["score"]) for r in full] == \
           [(r["doc_id"], r["score"]) for r in pruned]


@pytest.mark.spark
def test_blockmax_partial_term_coverage_is_conservative(spark):
    # the harder hole: a block whose metadata row for ONE term is
    # missing (partially merged segment) must not be skipped off an
    # underestimated ceiling — absent terms are charged their
    # saturation cap idf*(k1+1), so the pruned ranking still equals
    # the full one even when the dropped row belonged to the block
    # holding the true top document.
    from pyspark.sql import functions as F
    from commoncrawl_spark.operators.index import (
        bm25_search_blockmax, bm25_search_indexed, build_block_max,
        build_doclen, build_tf_index)
    # block 2 (ids 128..191 at span 64) holds the hash-rich true top
    # doc; every other block is join-only noise
    rows = []
    for i in range(240):
        if i == 151:
            text = "hash " * 30 + "join " * 5
        elif 128 <= i < 192:
            text = "join pad " + "x " * 20
        else:
            text = "join " + "filler " * 25
        rows.append((i, text.strip()))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    tf, dl = build_tf_index(d), build_doclen(d)
    holey = build_block_max(tf, dl, block_span=64).filter(
        ~((F.col("token") == "hash") & (F.col("block_id") == 2)))
    full = bm25_search_indexed(tf, dl, ["join", "hash"],
                               top_k=5).collect()
    pruned = bm25_search_blockmax(
        tf, dl, ["join", "hash"], champion_m=16, block_span=64,
        top_k=5, block_max=holey).collect()
    assert [(r["doc_id"], r["score"]) for r in full] == \
           [(r["doc_id"], r["score"]) for r in pruned]
    assert full[0]["doc_id"] == 151  # the scenario is non-trivial
