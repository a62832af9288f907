"""SymSpell fuzzy matching, RRF fusion, and query-likelihood retrieval:
hand-computed semantics plus the no-cartesian / no-window plan pins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.fuzzy import (
    delete_variants_col,
    fuzzy_term_candidates,
    vocab_histogram,
)
from commoncrawl_spark.operators.index import bm25_search, ql_search, rrf_fuse


@pytest.fixture(scope="module")
def vocab(spark):
    # (term, freq) hand histogram: 'join' common, 'joint' rarer, both
    # within distance 1 of the typo 'joind'
    return spark.createDataFrame(
        [("join", 900), ("joint", 40), ("hash", 800), ("scan", 700),
         ("table", 600), ("batch", 500), ("alpha", 10), ("aloha", 10)],
        "term string, freq long").cache()


@pytest.mark.spark
def test_delete_variants(spark):
    rows = spark.range(1).select(
        delete_variants_col(F.lit("abc")).alias("v"),
        delete_variants_col(F.lit("aa")).alias("dup"),
        delete_variants_col(F.lit("")).alias("empty"),
    ).collect()[0]
    assert sorted(rows["v"]) == ["ab", "abc", "ac", "bc"]
    # repeated chars collapse to distinct keys
    assert sorted(rows["dup"]) == ["a", "aa"]
    assert rows["empty"] == [""]


@pytest.mark.spark
def test_fuzzy_covers_all_three_edit_kinds(spark, vocab):
    out = fuzzy_term_candidates(
        vocab, ["joind", "hsh", "scen", "batch", "zzz"], top_k=3)
    got = {(r["query_term"], r["candidate"]): (r["dist"], r["rank"])
           for r in out.collect()}
    assert got[("joind", "join")] == (1, 1)    # deletion repairs typo
    assert got[("hsh", "hash")] == (1, 1)      # insertion repairs typo
    assert got[("scen", "scan")] == (1, 1)     # substitution
    assert got[("batch", "batch")] == (0, 1)   # exact hit, dist 0
    assert not any(q == "zzz" for q, _ in got)  # no candidate -> no row
    # 'joint' is also distance 1 from 'joind' but less frequent
    assert got[("joind", "joint")] == (1, 2)


@pytest.mark.spark
def test_fuzzy_distance_outranks_frequency(spark, vocab):
    # 'aloha' exact (freq 10) must rank first even though 'alpha' is a
    # distance-1 substitution neighbor with identical freq
    out = fuzzy_term_candidates(vocab, ["aloha"], top_k=5).collect()
    assert out[0]["candidate"] == "aloha" and out[0]["dist"] == 0
    got = {r["candidate"]: r["dist"] for r in out}
    assert got["alpha"] == 1  # lev(aloha, alpha) = 1 (o->p)


@pytest.mark.spark
def test_fuzzy_transposition_is_distance_2(spark):
    # 'ab' vs 'ba': delete-1 keys COLLIDE ('a' and 'b') so the pair is
    # generated — but plain Levenshtein is 2 (no transposition edit),
    # so verification must reject it
    v = spark.createDataFrame([("ab", 5)], "term string, freq long")
    out = fuzzy_term_candidates(v, ["ba"], top_k=5).collect()
    assert out == []


@pytest.mark.spark
def test_fuzzy_tie_breaks_on_term(spark):
    v = spark.createDataFrame(
        [("cat", 5), ("car", 5), ("cab", 5)], "term string, freq long")
    out = fuzzy_term_candidates(v, ["ca"], top_k=3).collect()
    assert [r["candidate"] for r in out] == ["cab", "car", "cat"]
    assert [r["rank"] for r in out] == [1, 2, 3]


@pytest.mark.spark
def test_fuzzy_plan_no_cartesian_no_window(spark, vocab):
    out = fuzzy_term_candidates(vocab, ["joind", "hsh"], top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.spark
def test_fuzzy_refuses_max_edit_2(spark, vocab):
    with pytest.raises(ValueError, match="max_edit=1"):
        fuzzy_term_candidates(vocab, ["x"], max_edit=2)


@pytest.mark.spark
def test_vocab_histogram(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string")
    got = {r["term"]: r["freq"] for r in vocab_histogram(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}
    got2 = {r["term"]
            for r in vocab_histogram(df, min_freq=2).collect()}
    assert got2 == {"a", "b"}


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------


@pytest.mark.spark
def test_rrf_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (4, 3)], "doc_id long, rank int")
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], top_k=10).collect()}
    # doc 1: 1/61 + 1/62 ; doc 3: 1/63 + 1/61 ; doc 2: 1/62 ; doc 4: 1/63
    assert rows[1]["score"] == round(1 / 61 + 1 / 62, 6)
    assert rows[3]["score"] == round(1 / 63 + 1 / 61, 6)
    assert rows[1]["rank"] == 1 and rows[3]["rank"] == 2
    assert rows[1]["n_lists"] == 2 and rows[2]["n_lists"] == 1
    assert rows[2]["rank"] == 3 and rows[4]["rank"] == 4  # tie -> id asc


@pytest.mark.spark
def test_rrf_weights_and_validation(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1)], "doc_id long, rank int")
    rows = {r["doc_id"]: r["score"]
            for r in rrf_fuse([a, b], weights=[2.0, 1.0]).collect()}
    assert rows[1] == round(2.0 / 61, 6)
    assert rows[2] == round(1.0 / 61, 6)
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])


@pytest.mark.spark
def test_rrf_plan_no_window(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1)], "doc_id long, rank int")
    plan = rrf_fuse([a, b])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Query-likelihood / Dirichlet
# ---------------------------------------------------------------------------


def _ql_oracle(docs, terms, mu):
    """Pure-python replica of the decomposed Dirichlet score."""
    toks = {d: t.split() for d, t in docs}
    ctot = sum(len(t) for t in toks.values())
    cf = {q: sum(t.count(q) for t in toks.values()) for q in terms}
    live = sorted(q for q in terms if cf[q] > 0)
    qc = 0.0
    for q in live:
        qc += math.log(mu * cf[q] / ctot)
    out = {}
    for d, t in toks.items():
        present = sorted(q for q in live if q in t)
        if not present:
            continue
        sp = 0.0
        for q in present:
            sp += math.log(1.0 + t.count(q) / (mu * cf[q] / ctot))
        out[d] = round(
            sp + qc - len(live) * math.log(len(t) + mu), 6)
    return out


@pytest.mark.spark
def test_ql_matches_python_oracle(spark):
    docs = [(1, "spark join spark"), (2, "spark other words here"),
            (3, "join " + "pad " * 20), (4, "nothing relevant at all")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["spark", "join", "absentterm"]
    got = {r["doc_id"]: r["score"]
           for r in ql_search(df, terms, mu=100.0, top_k=10).collect()}
    assert got == _ql_oracle(docs, terms, 100.0)


@pytest.mark.spark
def test_ql_semantics(spark):
    df = spark.createDataFrame(
        [(1, "spark spark join"), (2, "spark join"),
         (3, "spark " + "pad " * 40), (4, "unrelated")],
        "doc_id long, text string")
    rows = ql_search(df, ["spark", "join"], mu=50.0, top_k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert 4 not in ranks           # no query term -> not scored
    assert ranks[1] == 1            # higher tf, both terms
    # long padded doc is penalized below the crisp two-term doc
    assert ranks[2] < ranks[3]


@pytest.mark.spark
def test_ql_plan_no_window(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string")
    out = ql_search(df, ["a", "b"], top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan or "Limit" in plan


@pytest.mark.spark
def test_ql_hybrid_rrf_composition(spark):
    """The hybrid shape: BM25 and QL rankings over the same corpus
    fused with RRF — agreement promotes, disagreement demotes."""
    df = spark.createDataFrame(
        [(1, "spark join spark join"), (2, "spark join"),
         (3, "spark unrelated filler"), (4, "nothing here")],
        "doc_id long, text string")
    lex = bm25_search(df, ["spark", "join"], top_k=4)
    ql = ql_search(df, ["spark", "join"], top_k=4)
    fused = rrf_fuse([lex.select("doc_id", "rank"),
                      ql.select("doc_id", "rank")], top_k=4).collect()
    by_rank = [r["doc_id"] for r in sorted(fused, key=lambda r: r["rank"])]
    assert by_rank[0] == 1          # both rankers agree on doc 1
    assert 4 not in by_rank


# ---------------------------------------------------------------------------
# RM1 expansion + KWIC snippets
# ---------------------------------------------------------------------------


def _rm_oracle(docs, terms, mu, fb_docs, fb_terms):
    ql = _ql_oracle(docs, terms, mu)
    top = sorted(ql.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_docs]
    mx = max(s for _, s in top)
    w = {d: math.exp(s - mx) for d, s in top}
    z = 0.0
    for d in sorted(w):
        z += w[d]
    toks = {d: t.split() for d, t in docs}
    scores = {}
    for d in sorted(w):
        tl = toks[d]
        for t in set(tl):
            scores.setdefault(t, 0.0)
    for t in scores:
        s = 0.0
        for d in sorted(w):
            tl = toks[d]
            if t in tl:
                s += tl.count(t) / len(tl) * w[d] / z
        scores[t] = round(s, 6)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    return {t: (s, i + 1) for i, (t, s) in enumerate(out)}


@pytest.mark.spark
def test_rm_expansion_matches_python_oracle(spark):
    from commoncrawl_spark.operators.index import rm_expansion

    docs = [(1, "spark join spark shuffle"), (2, "spark join broadcast"),
            (3, "join shuffle shuffle skew"), (4, "unrelated filler words"),
            (5, "spark spark spark join")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["term"]: (r["score"], r["rank"])
           for r in rm_expansion(
               df, ["spark", "join"], mu=50.0,
               fb_docs=3, fb_terms=5).collect()}
    assert got == _rm_oracle(docs, ["spark", "join"], 50.0, 3, 5)
    # expansion surfaces co-occurring vocabulary beyond the query
    assert any(t in got for t in ("shuffle", "broadcast"))


@pytest.mark.spark
def test_kwic_hand_cases(spark):
    from commoncrawl_spark.operators.index import kwic_snippets

    df = spark.createDataFrame(
        [(1, "a b c d e TARGET f g h i j"),
         (2, "TARGET x y"),                  # hit at doc start: clamp
         (3, "p q r s TARGET"),              # hit at doc end: short tail
         (4, "no match here"),
         (5, "TARGET other target TARGET")],  # n_hits inside window
        "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in kwic_snippets(df, ["target"], width=4).collect()}
    # width 4, before = 2; doc 1: first hit at token 6 (1-based),
    # window starts at token 4
    assert rows[1]["first_pos"] == 6
    assert rows[1]["snippet"] == "d e target f"
    assert rows[1]["n_hits"] == 1
    # doc 2: clamp at document start
    assert rows[2]["first_pos"] == 1 and rows[2]["snippet"] == "target x y"
    # doc 3: tail window shorter than width
    assert rows[3]["snippet"] == "r s target"
    assert 4 not in rows
    # doc 5: lowercased tokens -> 3 hits, window catches all of them
    assert rows[5]["n_hits"] == 3


@pytest.mark.spark
def test_kwic_plan_no_shuffle_no_python(spark):
    from commoncrawl_spark.operators.index import kwic_snippets

    df = spark.createDataFrame(
        [(1, "a target b")], "doc_id long, text string")
    plan = kwic_snippets(df, ["target"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# corrected BM25 search (did-you-mean composition)
# ---------------------------------------------------------------------------


@pytest.mark.spark
def test_corrected_search_equals_bm25_on_corrected_terms(spark):
    from commoncrawl_spark.operators.fuzzy import corrected_bm25_search
    from commoncrawl_spark.operators.index import bm25_search

    df = spark.createDataFrame(
        [(1, "spark join spark shuffle"), (2, "spark join broadcast"),
         (3, "join shuffle shuffle skew"), (4, "unrelated filler words")],
        "doc_id long, text string")
    # 'joinn' -> join (delete), 'sprk' -> spark (insert); both dist 1
    got = {(r["doc_id"], r["score"], r["rank"])
           for r in corrected_bm25_search(
               df, ["joinn", "sprk"], top_k=4).collect()}
    want = {(r["doc_id"], r["score"], r["rank"])
            for r in bm25_search(df, ["join", "spark"], top_k=4).collect()}
    assert got == want and got


@pytest.mark.spark
def test_corrected_search_exact_term_corrects_to_itself(spark):
    from commoncrawl_spark.operators.fuzzy import corrected_bm25_search
    from commoncrawl_spark.operators.index import bm25_search

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "delta")],
        "doc_id long, text string")
    # 'alpha' is in-vocab (dist 0 beats every dist-1 neighbor);
    # 'zzzzzz' has no dist-1 neighbor and is dropped
    got = {(r["doc_id"], r["score"])
           for r in corrected_bm25_search(
               df, ["alpha", "zzzzzz"]).collect()}
    want = {(r["doc_id"], r["score"])
            for r in bm25_search(df, ["alpha"]).collect()}
    assert got == want


@pytest.mark.spark
def test_corrected_search_collapses_same_correction(spark):
    from commoncrawl_spark.operators.fuzzy import corrected_bm25_search
    from commoncrawl_spark.operators.index import bm25_search

    df = spark.createDataFrame(
        [(1, "table chairs"), (2, "table lamp"), (3, "sofa")],
        "doc_id long, text string")
    # both misspellings correct to 'table'; scored once, not twice
    got = {(r["doc_id"], r["score"])
           for r in corrected_bm25_search(
               df, ["tble", "tabl"]).collect()}
    want = {(r["doc_id"], r["score"])
            for r in bm25_search(df, ["table"]).collect()}
    assert got == want
