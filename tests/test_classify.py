"""Naive Bayes quality classifier: hand-computed arithmetic, held-out
separation, OOV/empty-doc semantics, and broadcast-scoring plan pins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.classify import (
    nb_classify,
    nb_evaluate,
    nb_train,
)


def _toy(spark):
    return spark.createDataFrame(
        [
            (1, "good great good", True),
            (2, "great fine good", True),
            (3, "bad awful bad", False),
            (4, "awful poor bad", False),
        ],
        "doc_id long, text string, label boolean",
    )


@pytest.mark.spark
def test_nb_train_hand_computed(spark):
    model, priors = nb_train(_toy(spark))
    got = {r["token"]: r["log_odds"] for r in model.collect()}
    # vocab = {good, great, fine, bad, awful, poor} -> V=6; Np=Nn=6
    # p(good|pos) = (3+1)/(6+6), p(good|neg) = (0+1)/(6+6)
    assert got["good"] == pytest.approx(math.log(4 / 1))
    assert got["bad"] == pytest.approx(math.log(1 / 4))
    assert got["fine"] == pytest.approx(math.log(2 / 1))
    pr = priors.collect()[0]
    assert pr["n_pos_docs"] == 2 and pr["n_neg_docs"] == 2
    assert pr["log_prior_odds"] == pytest.approx(0.0)


@pytest.mark.spark
def test_nb_classify_score_and_oov(spark):
    train = _toy(spark)
    model, priors = nb_train(train)
    test = spark.createDataFrame(
        [
            (10, "good good zzz"),   # zzz is OOV -> contributes 0
            (11, "bad poor"),
            (12, ""),                # empty -> prior only, kept
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           nb_classify(test, model, priors).collect()}
    assert got[10]["score"] == pytest.approx(
        round(2 * math.log(4), 6), abs=1e-6)
    assert got[10]["pred"] is True
    assert got[11]["pred"] is False
    assert got[12]["n_tokens"] == 0
    assert got[12]["score"] == pytest.approx(0.0)  # prior log-odds = 0
    assert got[12]["pred"] is False  # strict > 0


@pytest.mark.spark
def test_nb_evaluate_confusion_cells(spark):
    train = _toy(spark)
    model, priors = nb_train(train)
    test = spark.createDataFrame(
        [(20, "good great", True), (21, "awful bad", False),
         (22, "bad bad", True)],  # a mislabeled doc -> off-diagonal
        "doc_id long, text string, label boolean",
    )
    scored = nb_classify(test, model, priors)
    cells = {(r["label"], r["pred"]): r["n"]
             for r in nb_evaluate(
                 scored, test.select("doc_id", "label")).collect()}
    assert cells[(True, True)] == 1
    assert cells[(False, False)] == 1
    assert cells[(True, False)] == 1
    assert (False, True) not in cells


@pytest.mark.spark
def test_nb_separates_held_out_constructed_corpus(spark):
    # a controlled two-vocabulary corpus (class words + shared noise),
    # split held-out by the same md5-bucket family the queries use
    pos_v = ["gut", "sehr", "danke", "bitte", "schnell"]
    neg_v = ["good", "very", "thanks", "please", "fast"]
    shared = ["www", "http", "page", "site"]
    rows = []
    for i in range(200):
        label = i % 3 == 0
        v = pos_v if label else neg_v
        text = " ".join(
            [v[(i + j) % len(v)] for j in range(6)]
            + [shared[(i + j) % len(shared)] for j in range(3)])
        rows.append((i, text, label))
    lab = spark.createDataFrame(
        rows, "doc_id long, text string, label boolean")
    bucket = (
        F.conv(F.substring(
            F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 5
    )
    lab = lab.withColumn("b", bucket)
    train, test = lab.where("b < 4"), lab.where("b = 4")
    model, priors = nb_train(train)
    scored = nb_classify(test, model, priors)
    cells = {(r["label"], r["pred"]): r["n"]
             for r in nb_evaluate(
                 scored, test.select("doc_id", "label")).collect()}
    total = sum(cells.values())
    correct = cells.get((True, True), 0) + cells.get((False, False), 0)
    assert total == test.count() and total > 0
    assert correct == total  # disjoint class vocab -> perfect held-out


@pytest.mark.spark
def test_nb_classify_plan_broadcasts_model(spark):
    train = _toy(spark)
    model, priors = nb_train(train)
    test = spark.createDataFrame(
        [(i, "good bad fine") for i in range(50)],
        "doc_id long, text string")
    out = nb_classify(test, model, priors)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus tf stream must NOT shuffle on the token key: the
    # model joins via explicit broadcast (vocab-sized, Heaps-bounded)
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    for line in plan.splitlines():
        if ("SortMergeJoin" in line and "token" in line
                and "FullOuter" not in line):
            # the only sanctioned token-key SMJ is nb_train's vocab
            # FullOuter merge (full outer cannot broadcast; both sides
            # are vocab-sized) — the CORPUS tf stream must broadcast
            raise AssertionError(f"token-key SMJ in scoring plan: {line}")


@pytest.mark.spark
def test_logreg_learns_separable_threshold(spark):
    """1-D separable data (y = x > 0): GD must find a positive slope
    and classify the training set perfectly."""
    from commoncrawl_spark.operators.classify import (
        logreg_scores, logreg_train,
    )

    rows = [(float(i > 0), round(i / 10.0, 6)) for i in range(-20, 21) if i]
    feats = spark.createDataFrame(rows, "y double, x1 double")
    w = logreg_train(feats, ["x1"], iters=30, lr=4.0)
    assert w[1] > 1.0  # slope up
    scored = logreg_scores(feats, w, ["x1"])
    bad = scored.filter(F.col("pred") != F.col("y").cast("int")).count()
    assert bad == 0


@pytest.mark.spark
def test_logreg_first_step_hand_computed(spark):
    """One GD step from zero init: p = 0.5 for every row, so
    grad_b = mean(0.5 - y) and grad_x = mean((0.5 - y) * x) — weights
    must land exactly on the 6dp-rounded closed form."""
    from commoncrawl_spark.operators.classify import logreg_train

    rows = [(1.0, 0.4), (0.0, -0.2), (0.0, 0.1), (1.0, 0.3)]
    feats = spark.createDataFrame(rows, "y double, x1 double")
    w = logreg_train(feats, ["x1"], iters=1, lr=2.0)
    # grads: b: mean(.5-y) = 0; x1: mean((.5-y)*x1) = (-.2+-.1+.05+-.15)/4
    gx = round((-0.5 * 0.4 + 0.5 * -0.2 + 0.5 * 0.1 + -0.5 * 0.3) / 4, 6)
    assert w == [0.0, round(-2.0 * gx, 6)]
    with pytest.raises(ValueError, match="iters"):
        logreg_train(feats, ["x1"], iters=0)


@pytest.mark.spark
def test_logreg_deterministic_across_partitionings(spark):
    """Quantized gradient sums: 1 vs 16 partitions must produce
    bit-identical weights."""
    from commoncrawl_spark.operators.classify import logreg_train

    rows = [(float(i % 2), round((i * 37 % 100) / 50.0 - 1, 6))
            for i in range(200)]
    feats = spark.createDataFrame(rows, "y double, x1 double")
    w1 = logreg_train(feats.coalesce(1), ["x1"], iters=5)
    w16 = logreg_train(feats.repartition(16), ["x1"], iters=5)
    assert w1 == w16


@pytest.mark.spark
def test_logreg_scores_plan_pure_codegen(spark):
    from commoncrawl_spark.operators.classify import logreg_scores

    feats = spark.createDataFrame(
        [(1.0, 0.5), (0.0, -0.5)], "y double, x1 double")
    out = logreg_scores(feats, [0.1, 2.0], ["x1"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # scoring is scan-stage arithmetic


# ---------------------------------------------------------------------------
# host reputation priors
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_host_quality_prior_shrinks_small_hosts(spark):
    from commoncrawl_spark.operators.classify import host_quality_prior

    rows = (
        [("big-good", True)] * 95 + [("big-good", False)] * 5
        + [("big-bad", True)] * 5 + [("big-bad", False)] * 95
        + [("tiny", True), ("tiny", False)]           # raw 0.5, no evidence
    )
    df = spark.createDataFrame(rows, "host string, keep boolean")
    got = {r["host"]: r for r in host_quality_prior(df).collect()}
    g = (95 + 5 + 1) / 202                            # corpus keep rate
    assert got["big-good"]["verdict"] == "trusted"
    assert got["big-bad"]["verdict"] == "blocked"
    # the tiny host shrinks toward g, not its raw 0.5
    assert got["tiny"]["shrunk_rate"] == round((1 + 20 * g) / 22, 6)
    assert got["tiny"]["verdict"] == "neutral"
    assert got["big-good"]["shrunk_rate"] == round((95 + 20 * g) / 120, 6)
    assert got["big-good"]["raw_rate"] == 0.95


@pytest.mark.spark
def test_host_quality_prior_plan_partial_agg_no_window(spark):
    from commoncrawl_spark.operators.classify import host_quality_prior
    from commoncrawl_spark.plans.explain import plan_string

    df = spark.createDataFrame([("h", True)], "host string, keep boolean")
    p = plan_string(host_quality_prior(df), "simple")
    assert "partial_" in p and "Window" not in p and "EvalPython" not in p
