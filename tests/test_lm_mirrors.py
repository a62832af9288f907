"""Unigram-LM scoring and host mirror detection: hand-computed
semantics, smoothing, the ubiquity cap, and all-Catalyst plan shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.lm import (
    unigram_counts,
    unigram_logprob_scores,
)
from commoncrawl_spark.operators.mirrors import (
    host_content_overlap,
    mirror_hosts,
)


@pytest.mark.spark
def test_unigram_scores_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    # corpus counts: a=3, b=2, total=5
    exp1 = (2 * math.log(3 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(3 / 5) + math.log(2 / 5)) / 2
    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == round(exp1, 6)
    assert got[2]["n_tokens"] == 2
    assert got[2]["avg_logprob"] == round(exp2, 6)
    # empty document: present in the output, null score
    assert got[3]["n_tokens"] == 0 and got[3]["avg_logprob"] is None


@pytest.mark.spark
def test_unigram_oov_smoothing(spark):
    """External counts + Laplace alpha: an OOV token gets finite mass
    (cnt + a) / (total + a * vocab) instead of -inf."""
    train = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string")
    counts = unigram_counts(train)  # a=3, b=1; total=4, vocab=2
    score = spark.createDataFrame(
        [(9, "a z")], "doc_id long, text string")
    row = unigram_logprob_scores(score, counts=counts, alpha=1.0).first()
    exp = (math.log((3 + 1) / (4 + 2)) + math.log((0 + 1) / (4 + 2))) / 2
    assert row["avg_logprob"] == round(exp, 6)


@pytest.mark.spark
def test_unigram_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (unigram_logprob_scores(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan  # totals ride a broadcast NL join


@pytest.mark.spark
def test_host_overlap_hand_computed(spark):
    hf = spark.createDataFrame(
        [("h1", "f1"), ("h1", "f2"), ("h1", "f3"),
         ("h2", "f1"), ("h2", "f2"), ("h2", "f4"),
         ("h3", "f9"),
         ("h2", "f1")],  # duplicate (host, fp) row must not double-count
        "host string, fingerprint string")
    rows = {(r["host_a"], r["host_b"]): r
            for r in host_content_overlap(hf).collect()}
    assert set(rows) == {("h1", "h2")}
    r = rows[("h1", "h2")]
    assert (r["shared"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["overlap"] == round(2 / 3, 6)
    m = mirror_hosts(hf, threshold=0.5).collect()
    assert [(x["host_a"], x["host_b"]) for x in m] == [("h1", "h2")]


@pytest.mark.spark
def test_host_overlap_ubiquity_cap(spark):
    """A fingerprint on more hosts than the cap is excluded from
    ``shared`` (boilerplate is not mirror evidence) but still counts in
    each host's page total."""
    hf = spark.createDataFrame(
        [("h1", "boiler"), ("h2", "boiler"), ("h3", "boiler"),
         ("h1", "f1"), ("h2", "f1"),
         ("h1", "f2"), ("h2", "f2"),
         ("h1", "f3")],
        "host string, fingerprint string")
    rows = {(r["host_a"], r["host_b"]): r
            for r in host_content_overlap(hf, max_hosts_per_fp=2).collect()}
    r = rows[("h1", "h2")]
    assert (r["shared"], r["n_a"], r["n_b"]) == (2, 4, 3)
    assert r["overlap"] == round(2 / 3, 6)
    assert ("h1", "h3") not in rows  # only the capped fp was shared


@pytest.mark.spark
def test_host_overlap_plan_is_jvm_only(spark):
    hf = spark.createDataFrame(
        [("h1", "f1"), ("h2", "f1")], "host string, fingerprint string")
    plan = (host_content_overlap(hf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.spark
def test_bigram_scores_hand_computed(spark):
    """p(w2|w1) = c(w1,w2)/c(w1,.) over the corpus; per-doc mean of the
    logs; short docs (under two tokens) score null."""
    from commoncrawl_spark.operators.lm import bigram_logprob_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
    # bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b)
    # c(a,b)=3, c(b,a)=1; c(a,.)=3, c(b,.)=1
    exp1 = (2 * math.log(3 / 3) + math.log(1 / 1)) / 3   # = 0.0
    exp2 = math.log(3 / 3)                               # = 0.0
    assert got[1]["n_bigrams"] == 3
    assert got[1]["avg_logprob"] == round(exp1, 6)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["avg_logprob"] == round(exp2, 6)
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logprob"] is None


@pytest.mark.spark
def test_bigram_scores_discriminate(spark):
    """A doc of common transitions outranks one of rare transitions."""
    from commoncrawl_spark.operators.lm import bigram_logprob_scores

    rows = [(i, "the cat sat") for i in range(9)] + [(9, "the dog ran")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"]
           for r in bigram_logprob_scores(df).collect()}
    assert got[0] > got[9]


@pytest.mark.spark
def test_unigram_external_counts_oov_unsmoothed_is_null(spark):
    """External counts + alpha=0: a document containing any OOV token
    scores null (averaging only in-vocab tokens would rank gibberish
    high); in-vocab documents score normally."""
    from commoncrawl_spark.operators.lm import (
        unigram_counts,
        unigram_logprob_scores,
    )

    train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    counts = unigram_counts(train)
    score = spark.createDataFrame(
        [(8, "a b"), (9, "a zz")], "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob_scores(
        score, counts=counts).collect()}
    assert got[8] is not None
    assert got[9] is None


@pytest.mark.spark
def test_bigram_external_counts_oov_is_null(spark):
    from commoncrawl_spark.operators.lm import (
        bigram_counts,
        bigram_logprob_scores,
    )

    train = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string")
    counts = bigram_counts(train)
    score = spark.createDataFrame(
        [(8, "a b"), (9, "a b z")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob_scores(
        score, counts=counts).collect()}
    assert got[8]["avg_logprob"] is not None
    assert got[9]["avg_logprob"] is None
    assert got[9]["n_bigrams"] == 2  # actual pairs still counted


@pytest.mark.spark
def test_lm_scoring_joins_broadcast_model_tables(spark):
    """Both LM scorers join the type-bounded model tables as explicit
    broadcasts — the per-doc tf/pair stream never shuffles on token or
    pair keys (where stopword/common-pair skew lives)."""
    from commoncrawl_spark.operators.lm import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(i, f"the quick fox number {i} jumps") for i in range(20)],
        "doc_id long, text string")
    for fn in (unigram_logprob_scores, bigram_logprob_scores):
        out = fn(df)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__


@pytest.mark.spark
def test_lm_broadcast_size_gate(spark):
    """The bigram scorers' model-table broadcast is size-gated: above
    ``broadcast_row_limit`` the auto mode (default) must NOT plant a
    broadcast hint — bigram TYPES are not Heaps-bounded, and an
    unconditional hint is a guaranteed OOM at the 10^13-token design
    point. Values are identical in all three modes (the hint is
    physical only)."""
    from commoncrawl_spark.operators.lm import (
        bigram_logprob_scores,
        kneser_ney_scores,
        stupid_backoff_scores,
    )

    df = spark.createDataFrame(
        [(i, f"the quick fox number {i} jumps over fence {i % 3}")
         for i in range(30)],
        "doc_id long, text string")

    def hints(out):
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("strategy=broadcast")

    for fn in (bigram_logprob_scores, stupid_backoff_scores,
               kneser_ney_scores):
        # model table far above a tiny limit -> auto refuses the
        # bigram-table hint. stupid_backoff still hints its unigram
        # table (genuinely Heaps-bounded), so count hints, expect the
        # pair-keyed ones gone: bigram+ctx(+cont) hints disappear.
        gated = fn(df, broadcast_counts=None, broadcast_row_limit=1)
        forced = fn(df, broadcast_counts=True)
        auto = fn(df)  # default auto, tiny corpus -> hint present
        assert hints(forced) > hints(gated), fn.__name__
        assert hints(auto) == hints(forced), fn.__name__
        rows_g = {r["doc_id"]: tuple(r) for r in gated.collect()}
        rows_f = {r["doc_id"]: tuple(r) for r in forced.collect()}
        assert rows_g == rows_f, fn.__name__
        # gated plan actually joins without broadcasting the pair table
        phys = gated._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in phys or "ShuffledHashJoin" in phys, \
            fn.__name__


@pytest.mark.spark
def test_stupid_backoff_external_unigram_table_is_gated(spark):
    """With an EXTERNAL model, auto mode must size-gate the unigram
    table too — it is the caller's table, not Heaps-bounded by df, so
    'not False => broadcast' would re-open the OOM the gate closed."""
    from commoncrawl_spark.operators.lm import stupid_backoff_scores

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string")
    counts = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 2)], "w1 string, w2 string, cnt long")
    uni = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 2), ("d", 1)],
        "token string, cnt long")

    def hints(out):
        return out._jdf.queryExecution().optimizedPlan().toString() \
            .count("strategy=broadcast")

    gated = stupid_backoff_scores(
        df, counts=counts, unigrams=uni,
        broadcast_counts=None, broadcast_row_limit=1)
    forced = stupid_backoff_scores(
        df, counts=counts, unigrams=uni, broadcast_counts=True)
    # the single remaining hint is the sanctioned 1-row totals
    # crossJoin broadcast; all three MODEL-table hints must be gone
    assert hints(gated) == 1
    assert hints(forced) >= 4
    rows_g = {r["doc_id"]: tuple(r) for r in gated.collect()}
    rows_f = {r["doc_id"]: tuple(r) for r in forced.collect()}
    assert rows_g == rows_f


@pytest.mark.spark
def test_kneser_ney_hand_computed(spark):
    import math

    from commoncrawl_spark.operators.lm import kneser_ney_scores

    # corpus "a b a c": pairs (a,b),(b,a),(a,c) each once
    # ctx a: c1=2, N1+(a,.)=2; ctx b: c1=1, N1+=1
    # cont: N1+(.,b)=1, N1+(.,a)=1, N1+(.,c)=1; T=3; d=0.75
    # P(b|a) = 0.25/2 + (0.75*2/2)*(1/3) = 0.375
    # P(a|b) = 0.25/1 + (0.75*1/1)*(1/3) = 0.5
    # P(c|a) = 0.375
    df = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    r = kneser_ney_scores(df).first()
    want = round(
        (math.log(0.375) + math.log(0.5) + math.log(0.375)) / 3, 6)
    assert r["n_bigrams"] == 3
    assert r["avg_logprob"] == pytest.approx(want, abs=1e-6)


@pytest.mark.spark
def test_kneser_ney_normalizes(spark):
    # interpolated KN must sum to exactly 1 over the continuation-type
    # vocabulary for every context w1: the discounted mass is
    # 1 - d*N1+(w1,.)/c1 and the redistributed mass is d*N1+(w1,.)/c1
    from commoncrawl_spark.operators.lm import kneser_ney_scores  # noqa: F401

    corpus = "the cat sat on the mat the cat ran".split()
    pairs = list(zip(corpus, corpus[1:]))
    from collections import Counter
    cnt = Counter(pairs)
    c1 = Counter(p[0] for p in pairs)
    n_follow = Counter(p[0] for p in cnt)
    n_precede = Counter(p[1] for p in cnt)
    T = len(cnt)
    d = 0.75
    w2_types = set(n_precede)
    for w1 in c1:
        total = sum(
            max(cnt.get((w1, w2), 0) - d, 0) / c1[w1]
            + (d * n_follow[w1] / c1[w1]) * (n_precede[w2] / T)
            for w2 in w2_types)
        assert abs(total - 1.0) < 1e-12


@pytest.mark.spark
def test_kneser_ney_short_doc_and_external_oov(spark):
    from commoncrawl_spark.operators.lm import kneser_ney_scores

    df = spark.createDataFrame(
        [(1, "only"), (2, "x y z")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
           for r in kneser_ney_scores(df).collect()}
    assert got[1] == (0, None)
    assert got[2][0] == 2 and got[2][1] is not None
    # external counts missing (x,y): doc 2 nulls, n_bigrams still real
    ext = spark.createDataFrame(
        [("y", "z", 3)], "w1 string, w2 string, cnt long")
    got2 = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
            for r in kneser_ney_scores(df, counts=ext).collect()}
    assert got2[2] == (2, None)


@pytest.mark.spark
def test_kneser_ney_external_oov_parity_with_bigram_mle(spark):
    """Contract pin: against a SHARED external model table, the KN and
    MLE bigram scorers null the same documents (any out-of-table pair
    → null avg, n_bigrams always the document's actual pairs) — the
    two scorers must not drift on the OOV contract (`lm.py` docstring:
    'matching bigram_logprob_scores' contract')."""
    from commoncrawl_spark.operators.lm import (
        bigram_logprob_scores,
        kneser_ney_scores,
    )

    df = spark.createDataFrame(
        [(1, "a b c"),        # (a,b) in-table, (b,c) in-table
         (2, "a b x"),        # (b,x) missing -> null
         (3, "q r"),          # (q,r) missing -> null
         (4, "single"),       # no pairs -> n=0, null
         (5, "b c a b")],     # (b,c),(c,a),(a,b) all in-table
        "doc_id long, text string")
    ext = spark.createDataFrame(
        [("a", "b", 4), ("b", "c", 2), ("c", "a", 1)],
        "w1 string, w2 string, cnt long")
    kn = {r["doc_id"]: r for r in
          kneser_ney_scores(df, counts=ext).collect()}
    mle = {r["doc_id"]: r for r in
           bigram_logprob_scores(df, counts=ext).collect()}
    assert set(kn) == set(mle) == {1, 2, 3, 4, 5}
    for i in (1, 2, 3, 4, 5):
        assert kn[i]["n_bigrams"] == mle[i]["n_bigrams"], i
        assert (kn[i]["avg_logprob"] is None) == \
               (mle[i]["avg_logprob"] is None), i
    assert kn[2]["avg_logprob"] is None and kn[2]["n_bigrams"] == 2
    assert kn[3]["avg_logprob"] is None
    assert kn[4]["n_bigrams"] == 0 and kn[4]["avg_logprob"] is None
    assert kn[1]["avg_logprob"] is not None
    assert kn[5]["avg_logprob"] is not None


@pytest.mark.spark
def test_kneser_ney_rejects_bad_discount(spark):
    from commoncrawl_spark.operators.lm import kneser_ney_scores

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for bad in (0.0, 1.0, -0.5):
        with pytest.raises(ValueError):
            kneser_ney_scores(df, discount=bad)


@pytest.mark.spark
def test_kneser_ney_plan_shape(spark):
    from commoncrawl_spark.operators.lm import kneser_ney_scores

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string")
    out = kneser_ney_scores(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan   # model tables broadcast
