"""Model-based quality filtering: a multinomial Naive Bayes text
classifier trained, applied, and evaluated entirely in Catalyst.

Heuristic gates (Gopher rules, LM perplexity, DSIR log-ratios) are
unsupervised; the classifiers real pipelines actually deploy are
SUPERVISED — GPT-3 filtered Common Crawl with a model trained on
WebText-vs-crawl labels, LLaMA with a Wikipedia-reference classifier,
FineWeb-Edu with an educational-quality model. This module supplies
that stage: train per-token log-odds from a labeled corpus, score any
corpus against the model, and evaluate on a held-out split — with
every number reproducible by an external SQL engine (the oracle
contract of this repo). The closed-form member of the family is
multinomial NB with Laplace smoothing; the ITERATIVE member
(full-batch-GD logistic regression, once ruled out here) landed in r3
via the unrolled-CTE replay conventions — see logreg_train below. fastText without the learned
embedding — the same bag-of-tokens linear decision function.

Scale shapes (no Python anywhere):

- ``nb_train``: two token-count aggregates (map-side partial, one
  hash exchange each on token TYPES — Heaps-law bounded) merged with
  one vocab-sized full-outer join; class totals ride a 1-row frame.
  The model is a vocabulary table: broadcast material, never
  corpus-scale.
- ``nb_classify``: the corpus streams through ONE tokenize +
  per-(doc, token) aggregate; the model joins via explicit
  ``F.broadcast`` (the tf stream never shuffles on the token key,
  where stopword skew lives — the r03 lesson from the LM scorers);
  the per-doc fold is a map-side-partial sum on the unique doc id.
- ``nb_evaluate``: a slim id equi-join + a 4-group aggregate.

Out-of-vocabulary tokens contribute nothing to the score
(sklearn's ``CountVectorizer`` fit-vocabulary semantics): a token
unseen in EITHER class carries no class signal — only the smoothing
constants, i.e. class-size artifacts — so dropping it is both the
standard implementation and the deterministic choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analytics import tokens_col
from .lm import unigram_counts


def nb_train(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model from a labeled corpus
    (``label_col`` boolean: True = positive class).

    Returns ``(model, priors)``:

    - ``model``: ``(token, log_odds)`` over the train vocabulary —
      ``log_odds = ln p(t|pos) - ln p(t|neg)`` with Laplace-smoothed
      ``p(t|c) = (c_t + a) / (N_c + a * V)``, ``V`` the JOINT train
      vocabulary. Vocab-sized (token types): broadcast material.
    - ``priors``: one row ``(log_prior_odds, n_pos_docs, n_neg_docs)``
      with add-one smoothing on the document counts so a single-class
      training set stays finite.

    Both frames stay lazy — no driver collect; callers broadcast them
    into the scoring join.
    """
    pos = df.where(F.col(label_col))
    neg = df.where(~F.col(label_col))
    cp = unigram_counts(pos, text_col=text_col).withColumnRenamed(
        "cnt", "_cp")
    cn = unigram_counts(neg, text_col=text_col).withColumnRenamed(
        "cnt", "_cn")
    vocab = cp.join(cn, "token", "full_outer").select(
        "token",
        F.coalesce(F.col("_cp"), F.lit(0)).alias("_cp"),
        F.coalesce(F.col("_cn"), F.lit(0)).alias("_cn"),
    )
    totals = vocab.agg(
        F.sum("_cp").alias("_np"),
        F.sum("_cn").alias("_nn"),
        F.count(F.lit(1)).alias("_v"),
    )
    a = F.lit(float(smoothing))
    p_pos = (F.col("_cp").cast("double") + a) \
        / (F.col("_np").cast("double") + a * F.col("_v"))
    p_neg = (F.col("_cn").cast("double") + a) \
        / (F.col("_nn").cast("double") + a * F.col("_v"))
    model = (
        vocab.crossJoin(F.broadcast(totals))
        .select("token", F.log(p_pos / p_neg).alias("log_odds"))
    )
    priors = df.agg(
        F.sum(F.col(label_col).cast("long")).alias("n_pos_docs"),
        F.sum((~F.col(label_col)).cast("long")).alias("n_neg_docs"),
    ).select(
        F.log(
            (F.col("n_pos_docs").cast("double") + 1.0)
            / (F.col("n_neg_docs").cast("double") + 1.0)
        ).alias("log_prior_odds"),
        "n_pos_docs",
        "n_neg_docs",
    )
    return model, priors


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a corpus against a trained model: one row per input
    document, ``(id_col, n_tokens, score, pred)`` where ``score`` is
    the posterior log-odds ``log_prior_odds + sum(tf * log_odds)``
    over IN-VOCAB tokens (rounded to 6), and ``pred = score > 0``.
    Documents with no in-vocab tokens (including empty ones) score the
    prior alone — they are kept, not dropped.

    The tf-weighted sum is exact (log-odds are constant per token
    type), so no occurrence re-explode; the model join is an explicit
    broadcast so the corpus tf stream never shuffles on the token key.
    """
    tf = (
        df.select(
            F.col(id_col),
            F.explode_outer(tokens_col(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tf"))
    )
    real = F.col("token").isNotNull()
    scored = (
        tf.join(F.broadcast(model), "token", "left")
        .select(
            F.col(id_col),
            F.when(real, F.col("_tf")).otherwise(F.lit(0)).alias("_n"),
            (F.when(real, F.col("_tf").cast("double"))
             .otherwise(F.lit(0.0))
             * F.coalesce(F.col("log_odds"), F.lit(0.0))).alias("_lo"),
        )
        .groupBy(id_col)
        .agg(F.sum("_n").alias("n_tokens"), F.sum("_lo").alias("_sum"))
    )
    return (
        scored.crossJoin(F.broadcast(priors))
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("log_prior_odds") + F.col("_sum"), 6)
            .alias("score"),
            ((F.col("log_prior_odds") + F.col("_sum")) > 0).alias("pred"),
        )
    )


def nb_evaluate(
    scored: DataFrame,
    truth: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out evaluation: join predictions to gold labels on the
    unique doc id and emit the confusion table — one row per
    ``(label, pred)`` cell: ``(label, pred, n, avg_score)`` with
    ``avg_score`` the cell's mean posterior log-odds (rounded to 6).
    Precision/recall/F1 are ratios of these four counts; the table is
    the lossless form (and the hash-stable one).
    """
    joined = scored.join(
        truth.select(F.col(id_col), F.col(label_col).alias("label")),
        id_col)
    return joined.groupBy("label", "pred").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("score"), 6).alias("avg_score"),
    )


# ---------------------------------------------------------------------------
# Logistic regression: the iterative member, made oracle-able
# ---------------------------------------------------------------------------

def logreg_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 4,
    lr: float = 4.0,
) -> list[float]:
    """Full-batch gradient-descent logistic regression over a FIXED,
    small feature vector (bias implicit, prepended as weight 0) —
    deterministic enough for an external SQL engine to replay the
    training bit-for-bit, which the module docstring above once ruled
    out: the r03 unrolled-CTE machinery (kmeans_centroids, pagerank,
    BPE) lifts that, using the same two conventions —

    - per-row gradient contributions quantize to 1e-6-scaled LONGS
      before the sum (integer addition is associative: partition order
      cannot perturb the total);
    - the margin, the sigmoid, the averaged gradient and each weight
      round to 6dp every iteration, so double-precision drift never
      accumulates past the contract's rounding.

    Weights live on the DRIVER as D+1 floats (D is the feature count,
    single digits — scalar material like kmeans' K centroids; the
    per-iteration collect is one tiny row, never data). Feature values
    must already be 6dp-rounded by the caller.

    Returns ``[b, w_1, ..., w_D]`` after ``iters`` rounds from zero
    init. Scale shape per iteration: one scan of the feature frame,
    one map-side-partial sum aggregate — no joins, no windows; the
    model applies as literal arithmetic in the scan stage.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    w = [0.0] * (len(feature_cols) + 1)
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    for _ in range(iters):
        z = F.round(sum(F.lit(wj) * xj for wj, xj in zip(w, xs)), 6)
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        err = p - F.col(label_col)
        aggs = [
            F.sum(F.round(err * xj * 1e6).cast("long")).alias(f"g{j}")
            for j, xj in enumerate(xs)
        ] + [F.count(F.lit(1)).alias("n")]
        row = feats.agg(*aggs).collect()[0]  # one tiny row of scalars
        w = [
            round(wj - lr * round(row[f"g{j}"] / 1e6 / row["n"], 6), 6)
            for j, wj in enumerate(w)
        ]
    return w


def logreg_scores(
    feats: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Score with a trained weight vector: adds ``p`` (6dp sigmoid)
    and ``pred`` (1 iff p >= threshold). Pure scan-stage arithmetic —
    the model is literals, so the plan is one codegen'd projection."""
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    z = F.round(sum(F.lit(wj) * xj for wj, xj in zip(weights, xs)), 6)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        "*", p.alias("p"),
        F.when(p >= threshold, F.lit(1)).otherwise(F.lit(0)).alias("pred"))


# ---------------------------------------------------------------------------
# Host reputation priors (empirical-Bayes shrinkage of keep rates)
# ---------------------------------------------------------------------------


def host_quality_prior(
    docs: DataFrame,
    keep_col: str = "keep",
    host_col: str = "host",
    pseudo_count: float = 20.0,
    trust_at: float = 0.8,
    block_at: float = 0.3,
) -> DataFrame:
    """Domain-level curation prior from document-level quality verdicts
    — the RefinedWeb/FineWeb move of judging HOSTS, not just documents,
    so a domain whose pages keep failing is cut wholesale (and its
    unfetched pages never get crawled). Raw per-host keep rates are
    unusable at the tail: a host seen twice with one keep reads 0.5
    with no evidence. Beta-binomial shrinkage fixes that — ``shrunk =
    (keeps + m * g) / (n + m)`` with ``g`` the corpus keep rate and
    ``m`` the pseudo-count — so small hosts pull toward the corpus
    mean and only hosts with real evidence reach the ``trusted`` /
    ``blocked`` verdicts.

    Output: ``(host, n_docs, n_keep, raw_rate, shrunk_rate, verdict)``
    with rates rounded 6dp. DETERMINISM: counts are integers, ``g`` is
    one division of two exact sums, and each shrunk rate is one
    mul-add-divide off those — no order-dependent float accumulation.

    Scale shape: one map-side-partial (host) aggregate + a 1-row
    global broadcast; 10^10 docs collapse to host cardinality before
    anything else happens."""
    per_host = docs.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(keep_col).cast("long")).alias("n_keep"),
    )
    totals = per_host.agg(
        (F.sum("n_keep") / F.sum("n_docs")).alias("_g"))
    m = float(pseudo_count)
    shrunk = F.round(
        (F.col("n_keep") + F.lit(m) * F.col("_g"))
        / (F.col("n_docs") + F.lit(m)), 6)
    return (
        per_host.crossJoin(F.broadcast(totals))
        .select(
            host_col, "n_docs", "n_keep",
            F.round(F.col("n_keep") / F.col("n_docs"), 6)
            .alias("raw_rate"),
            shrunk.alias("shrunk_rate"),
            F.when(shrunk >= trust_at, F.lit("trusted"))
            .when(shrunk <= block_at, F.lit("blocked"))
            .otherwise(F.lit("neutral")).alias("verdict"),
        )
    )
