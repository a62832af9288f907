"""Stupid Backoff scoring + DSIR importance weights + token-budget
mixture sampling."""

from __future__ import annotations

import math

import pytest


@pytest.mark.spark
def test_stupid_backoff_self_trained_equals_bigram_mle(spark):
    from commoncrawl_spark.operators.lm import (
        bigram_logprob_scores,
        stupid_backoff_scores,
    )

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "c a"), (3, "solo"), (4, "")],
        "doc_id long, text string")
    mle = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
    sb = {r["doc_id"]: r for r in stupid_backoff_scores(df).collect()}
    for k in mle:
        assert sb[k]["n_bigrams"] == mle[k]["n_bigrams"]
        assert sb[k]["avg_logscore"] == mle[k]["avg_logprob"], k
    assert sb[3]["n_bigrams"] == 0 and sb[3]["avg_logscore"] is None
    assert sb[4]["n_bigrams"] == 0 and sb[4]["avg_logscore"] is None


@pytest.mark.spark
def test_stupid_backoff_external_counts_backs_off(spark):
    from commoncrawl_spark.operators.lm import (
        bigram_counts,
        stupid_backoff_scores,
        unigram_counts,
    )

    train = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string")
    bc, uc = bigram_counts(train), unigram_counts(train)
    score = spark.createDataFrame(
        # "b a" seen (2x); "b c" UNSEEN but both tokens known -> backoff;
        # "b z" has a true-OOV token -> NULL
        [(8, "b a"), (9, "b c"), (10, "b z")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in stupid_backoff_scores(
        score, counts=bc, unigrams=uc).collect()}
    # train tokens: a=3, b=2, c=1, N=6; pairs: (a,b)=2,(b,a)=2,(a,c)=1
    assert got[8]["avg_logscore"] == round(math.log(2 / 2), 6)
    assert got[9]["avg_logscore"] == round(math.log(0.4 * 1 / 6), 6)
    assert got[10]["avg_logscore"] is None
    assert got[10]["n_bigrams"] == 1


@pytest.mark.spark
def test_stupid_backoff_plan_broadcasts_model_tables(spark):
    from commoncrawl_spark.operators.lm import stupid_backoff_scores

    df = spark.createDataFrame(
        [(i, f"the quick fox number {i} jumps") for i in range(20)],
        "doc_id long, text string")
    out = stupid_backoff_scores(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_dsir_logratio_orders_target_like_docs_first(spark):
    from commoncrawl_spark.operators.selection import dsir_logratio_scores

    target = spark.createDataFrame(
        [(i, "physics energy quantum field theory") for i in range(5)],
        "doc_id long, text string")
    pool = spark.createDataFrame(
        [(1, "quantum field energy"),        # target-like
         (2, "buy cheap pills now casino"),  # not
         (3, "")],                           # empty
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dsir_logratio_scores(pool, target).collect()}
    assert got[1]["avg_logratio"] > got[2]["avg_logratio"]
    assert got[3]["n_tokens"] == 0 and got[3]["avg_logratio"] is None
    assert got[1]["n_tokens"] == 3


@pytest.mark.spark
def test_dsir_matches_hand_computation(spark):
    from commoncrawl_spark.operators.selection import dsir_logratio_scores

    target = spark.createDataFrame(
        [(1, "a a b")], "doc_id long, text string")
    pool = spark.createDataFrame(
        [(1, "a c")], "doc_id long, text string")
    got = dsir_logratio_scores(pool, target).collect()[0]
    # joint vocab {a, b, c} V=3; target: a=2,b=1,Nt=3; pool: a=1,c=1,Nb=2
    # alpha=1: p_t(a)=(2+1)/(3+3)=0.5  p_b(a)=(1+1)/(2+3)=0.4
    #          p_t(c)=(0+1)/6          p_b(c)=(1+1)/5
    want = (math.log(0.5 / 0.4) + math.log((1 / 6) / (2 / 5))) / 2
    assert got["avg_logratio"] == round(want, 6)


@pytest.mark.spark
def test_sample_token_budget_deterministic_and_budget_shaped(spark):
    from commoncrawl_spark.operators.selection import sample_token_budget

    rows = [(i, "en" if i % 4 else "de", "tok " * 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    budgets = spark.createDataFrame(
        [("en", 5000), ("fr", 999)], "lang string, budget_tokens long")
    got = sample_token_budget(df, budgets, group_col="lang")
    rows1 = sorted(r["doc_id"] for r in got.collect())
    rows2 = sorted(r["doc_id"] for r in got.collect())
    assert rows1 == rows2 and rows1  # deterministic, non-empty
    by_lang = {r["lang"] for r in got.collect()}
    assert by_lang == {"en"}  # de has no budget row; fr has no docs
    # en: 300 docs x 50 tokens = 15000 -> keep_frac = 1/3; expect ~100
    kept_tokens = sum(r["n_tokens"] for r in got.collect())
    assert 3000 < kept_tokens < 7500
    fracs = {r["keep_frac"] for r in got.collect()}
    assert fracs == {5000 / 15000}


@pytest.mark.spark
def test_sample_token_budget_keeps_all_under_budget(spark):
    from commoncrawl_spark.operators.selection import sample_token_budget

    df = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(10)],
        "doc_id long, lang string, text string")
    budgets = spark.createDataFrame(
        [("en", 10_000)], "lang string, budget_tokens long")
    got = sample_token_budget(df, budgets).collect()
    assert len(got) == 10
    assert all(r["keep_frac"] == 1.0 for r in got)


def test_temperature_budgets_flatten(spark):
    from commoncrawl_spark.operators.selection import temperature_budgets

    # two groups with a 100:1 token imbalance
    rows = [(i, "en", "w " * 100) for i in range(10)] + [(100, "mi", "w ")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # alpha=1: proportional shares (1000 vs 1 tokens -> ~999:1 budgets)
    b1 = {r["lang"]: r["budget_tokens"]
          for r in temperature_budgets(
              df, alpha=1.0, total_budget=10_000).collect()}
    assert b1["en"] + b1["mi"] <= 10_000
    assert b1["en"] / max(b1["mi"], 1) > 500
    # alpha=0.25: strongly flattened — the minority share rises from
    # ~0.1% to (1/1000)^0.25 ~ 15% of the head's mass
    b2 = {r["lang"]: r["budget_tokens"]
          for r in temperature_budgets(
              df, alpha=0.25, total_budget=10_000).collect()}
    assert b2["mi"] > 10 * b1["mi"]
    assert b2["en"] > b2["mi"]          # still ordered by size


def test_stupid_backoff_rejects_half_a_model(spark):
    import pytest

    from commoncrawl_spark.operators.lm import (
        bigram_counts,
        stupid_backoff_scores,
    )

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="TOGETHER"):
        stupid_backoff_scores(df, counts=bigram_counts(df))


@pytest.mark.spark
def test_weighted_sample_k_exact_size_and_determinism(spark):
    from commoncrawl_spark.operators.selection import weighted_sample_k

    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(200)], "doc_id long, w long")
    s1 = [r["doc_id"] for r in weighted_sample_k(df, 50, "w").collect()]
    s2 = [r["doc_id"]
          for r in weighted_sample_k(df.repartition(13), 50, "w").collect()]
    assert len(s1) == 50 and s1 == s2  # exact k, partition-independent
    # a different salt re-draws
    s3 = [r["doc_id"] for r in weighted_sample_k(df, 50, "w",
                                                 salt="v2").collect()]
    assert set(s3) != set(s1)


@pytest.mark.spark
def test_weighted_sample_k_respects_weights(spark):
    """Heavy rows must be sampled far more often: with weights 100 vs 1
    over many salts, heavy ids dominate the selection."""
    from commoncrawl_spark.operators.selection import weighted_sample_k

    rows = [(i, 100) for i in range(20)] + [(i, 1) for i in range(20, 200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    heavy = 0
    for salt in ("a", "b", "c", "d"):
        got = weighted_sample_k(df, 20, "w", salt=salt).collect()
        heavy += sum(1 for r in got if r["doc_id"] < 20)
    # 20 heavy ids carry 2000/2180 of the mass; by 4x20 draws nearly all
    # selections should be heavy (binomial tail makes < 48 astronomical)
    assert heavy >= 48


@pytest.mark.spark
def test_weighted_sample_k_excludes_nonpositive_and_validates(spark):
    from commoncrawl_spark.operators.selection import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, None), (4, 5)], "doc_id long, w long")
    got = weighted_sample_k(df, 10, "w").collect()
    assert [r["doc_id"] for r in got] == [4]
    with pytest.raises(ValueError):
        weighted_sample_k(df, 0, "w")


@pytest.mark.spark
def test_weighted_sample_k_plan_is_take_ordered(spark):
    """The selection must be TakeOrderedAndProject (parallel partial
    top-k), never a partition-less window or a global sort."""
    from commoncrawl_spark.operators.selection import weighted_sample_k

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_id long, w long")
    out = weighted_sample_k(df, 5, "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


@pytest.mark.spark
def test_soft_dedup_weights_exact_clusters(spark):
    from commoncrawl_spark.operators.selection import soft_dedup_weights

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text"),
         (4, "unique one two")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in soft_dedup_weights(df).collect()}
    for i in (1, 2, 3):
        assert got[i]["cluster_size"] == 3
        assert got[i]["weight"] == round(1 / 3, 6)
    assert got[4]["cluster_size"] == 1 and got[4]["weight"] == 1.0
    assert got[4]["n_tokens"] == 3
    # effective size: 3 copies contribute ~1 doc worth of tokens
    eff = sum(r["weighted_tokens"] for r in got.values())
    assert abs(eff - (2 + 3)) < 1e-3  # 'same text'=2 tokens once + unique 3


@pytest.mark.spark
def test_soft_dedup_weights_external_clusters(spark):
    from commoncrawl_spark.operators.selection import soft_dedup_weights

    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, "zzz")],
        "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster long")  # 3 unassigned
    got = {r["doc_id"]: r for r in
           soft_dedup_weights(corpus, clusters).collect()}
    assert got[1]["weight"] == 0.5 and got[2]["weight"] == 0.5
    assert got[3]["weight"] == 1.0 and got[3]["cluster_size"] == 1


# ---------------------------------------------------------------------------
# data-constrained epoch planning
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_epoch_plan_waterfills_to_budget(spark):
    from commoncrawl_spark.operators.selection import epoch_plan

    st = spark.createDataFrame(
        [("web", 1000, 1.0), ("books", 500, 2.0), ("wiki", 250, 4.0)],
        "source string, n_tokens long, max_epochs double")
    # budget 2500: web saturates at 1.0 (1000), books at 2.0 (1000),
    # wiki gets (2500-2000)/250 = 2.0 epochs (500)
    got = {r["source"]: r for r in epoch_plan(st, 2500.0).collect()}
    assert got["web"]["epochs"] == 1.0
    assert got["books"]["epochs"] == 2.0
    assert got["wiki"]["epochs"] == 2.0
    assert sum(r["alloc_tokens"] for r in got.values()) == 2500.0
    # mid-segment budget: web saturated, books+wiki share the level
    got = {r["source"]: r for r in epoch_plan(st, 2125.0).collect()}
    assert got["web"]["epochs"] == 1.0
    assert got["books"]["epochs"] == got["wiki"]["epochs"] == 1.5
    assert sum(r["alloc_tokens"] for r in got.values()) == 2125.0


@pytest.mark.spark
def test_epoch_plan_over_and_under_budget(spark):
    from commoncrawl_spark.operators.selection import epoch_plan

    st = spark.createDataFrame(
        [("a", 100, 2.0), ("b", 300, 4.0)],
        "source string, n_tokens long, max_epochs double")
    # budget above full saturation (200 + 1200): everyone at cap
    got = {r["source"]: r for r in epoch_plan(st, 10_000.0).collect()}
    assert got["a"]["epochs"] == 2.0 and got["b"]["epochs"] == 4.0
    assert sum(r["alloc_tokens"] for r in got.values()) == 1400.0
    # tiny budget: uniform level below every cap
    got = {r["source"]: r for r in epoch_plan(st, 200.0).collect()}
    assert got["a"]["epochs"] == got["b"]["epochs"] == 0.5
    assert sum(r["alloc_tokens"] for r in got.values()) == 200.0


@pytest.mark.spark
def test_epoch_plan_no_window_no_python(spark):
    from commoncrawl_spark.operators.selection import epoch_plan
    from commoncrawl_spark.plans.explain import plan_string

    st = spark.createDataFrame(
        [("a", 100, 2.0), ("b", 300, 4.0)],
        "source string, n_tokens long, max_epochs double")
    p = plan_string(epoch_plan(st, 500.0), "simple")
    assert "Window" not in p and "EvalPython" not in p


@pytest.mark.spark
def test_materialize_epochs_counts_and_determinism(spark):
    import hashlib

    from commoncrawl_spark.operators.selection import materialize_epochs

    docs = spark.createDataFrame(
        [(i, "web" if i < 60 else "wiki") for i in range(100)],
        "doc_id long, source string")
    plan = spark.createDataFrame(
        [("web", 1.0), ("wiki", 2.5)], "source string, epochs double")
    out = materialize_epochs(docs, plan).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # every web doc exactly once, epoch 0
    assert all(by_doc[i] == [0] for i in range(60))
    # wiki docs: 2 or 3 copies, exactly as the md5 draw dictates
    for i in range(60, 100):
        u = int(hashlib.md5(f"ep|{i}".encode()).hexdigest()[:8], 16) \
            / 4294967296.0
        want = 3 if u < 0.5 else 2
        assert sorted(by_doc[i]) == list(range(want)), i
    # order keys: per-epoch shuffles differ, rerun is identical
    k0 = sorted(r["order_key"] for r in out if r["epoch"] == 0
                and r["source"] == "wiki")
    k1 = sorted(r["order_key"] for r in out if r["epoch"] == 1
                and r["source"] == "wiki")
    assert k0 != k1
    again = materialize_epochs(docs, plan).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@pytest.mark.spark
def test_materialize_epochs_zero_epoch_group_drops(spark):
    from commoncrawl_spark.operators.selection import materialize_epochs

    docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id long, source string")
    plan = spark.createDataFrame([("a", 0.0), ("b", 1.0)],
                                 "source string, epochs double")
    out = materialize_epochs(docs, plan).collect()
    assert [(r["doc_id"], r["epoch"]) for r in out] == [(2, 0)]


@pytest.mark.spark
def test_materialize_epochs_plan_broadcast_no_python(spark):
    from commoncrawl_spark.operators.selection import materialize_epochs
    from commoncrawl_spark.plans.explain import plan_string

    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = spark.createDataFrame([("a", 2.0)], "source string, epochs double")
    p = plan_string(materialize_epochs(docs, plan), "simple")
    assert "BroadcastHashJoin" in p
    assert "EvalPython" not in p and "Window" not in p
