"""Corpus-statistics language-model quality scoring (unigram LM).

The CCNet / Gopher-era webtext pipelines score documents with a language
model trained on a trusted corpus and drop the worst-perplexity tail
(reference analog: the notebook's keyword quality gate is the degenerate
hand-written version of this — read_jsonl.ipynb cell 2's frequency
analysis is exactly a unigram fit). A full KenLM is out of scope for a
pure-Spark engine, but the unigram LM — token log-probabilities from
corpus frequencies — is the same pipeline shape and is exactly
expressible in Catalyst, so it serves both as a usable quality signal
and as the slot where a KenLM/ngram scorer would plug in.

Scale shapes (no Python anywhere):

- ``unigram_counts``: explode + groupBy(token) — ONE shuffle whose rows
  are (token, count) after map-side partial aggregation; the fat text
  column never moves.
- ``unigram_logprob_scores``: explode + join(counts) + groupBy(doc) —
  the join key is the token column; AQE broadcasts the counts side when
  the vocabulary is small (real-language vocabularies are ~10^6 rows =
  a few MB — essentially always broadcast), so the only exchange left
  is the per-document re-aggregation. Totals (corpus size / vocabulary)
  ride along as a 1-row crossJoin — no driver collect, the plan stays
  lazy end to end.

Determinism: scores are rounded to 6 decimals (the cross-engine compare
precision); the summation is a float add over per-token logs whose
error is ~1e-13 relative, far below the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analytics import tokens_col


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: corpus token frequencies ``(token, cnt)``. One explode +
    one hash exchange on the token (map-side partial count)."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_logprob_scores(
    df: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.0,
) -> DataFrame:
    """Score: per document, the mean natural-log unigram probability of
    its tokens under ``counts`` (default: self-trained on ``df`` — the
    exact MLE, every token in-vocabulary). Output one row per document:
    ``(id_col, n_tokens, avg_logprob)`` — higher is more typical;
    ``exp(-avg_logprob)`` is the perplexity. Empty documents score null.

    ``alpha`` > 0 applies Laplace smoothing ``(cnt + alpha) /
    (total + alpha * vocab)`` so out-of-vocabulary tokens (external
    ``counts``) get finite mass instead of dropping the document to
    -inf; with the default self-trained counts alpha=0 is exact.
    """
    if counts is None:
        counts = unigram_counts(df, text_col)
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_vocab"),
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    p_num = F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha)
    p_den = F.col("_total").cast("double") + F.lit(alpha) * F.col("_vocab")
    scored = (
        toks.join(counts, "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(p_num / p_den)), 6).alias("avg_logprob"),
        )
    )
    # empty documents fall out of the explode; restore them with nulls so
    # the output stays one-row-per-input-document (join key is the id)
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("avg_logprob"),
        )
    )
