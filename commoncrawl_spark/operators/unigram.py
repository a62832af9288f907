"""Distributed unigram-LM subword tokenizer training (Kudo, ACL 2018,
"Subword Regularization" — the SentencePiece default algorithm) — the
second learned-tokenizer family beside BPE (operators/bpe.py), trained
with the same scale discipline.

The scale insight is BPE's word-histogram reduction, reused: unigram
training statistics depend only on (word, frequency), so the 100 TB
corpus is tokenized ONCE (tokenize -> groupBy word) and every training
step runs over the histogram — a vocab-sized table whatever the corpus
size. Steps:

1. **Seed vocabulary** (``seed_vocab``): all substrings up to
   ``max_piece_len`` of histogram words, scored by occurrence-weighted
   corpus frequency, top ``seed_size`` multi-char pieces by
   (freq desc, piece asc) plus EVERY single character (coverage
   guarantee: any word segments into chars). SentencePiece seeds from
   an ESA/suffix-array sweep; the substring explode is the
   Spark-friendly equivalent — |word|*max_piece_len candidates per
   DISTINCT word, bounded.
2. **Hard-EM rounds** (``train_unigram``): the deterministic Viterbi
   variant of Kudo's EM — the E-step assigns each histogram word its
   single BEST segmentation under the current piece log-probs
   (ties: fewer pieces, then lexicographically smaller piece sequence
   — a strict total order, so the result is independent of candidate
   enumeration order, partitioning, and engine); the M-step recounts
   pieces weighted by INTEGER word frequencies — exact, associative,
   order-independent sums, where soft-EM's float expected counts
   would make the shuffle order observable. Zero-count pieces prune;
   single chars always survive (coverage).
3. **Encode** (``unigram_encode_udf``): Viterbi-segment the corpus
   with the final vocabulary — an Arrow-batched pandas UDF with
   per-batch word memoization (the histogram trick applied inside
   each batch), sharing ``viterbi_segment`` with the trainer, the
   tests, and the SQL-oracle replay.

Driver-visible model state: the vocabulary (<= ``seed_size`` + alphabet
rows — a few 10^5 at production settings) is collected and broadcast
each round, like BPE's per-round argmax row and the k-means centroids:
bounded MODEL state, never corpus data.

Float discipline: piece log-probs are ``ln(count/total)`` on exact
integer counts, and the Viterbi comparison key is
(cost, n_pieces, joined-path) with the path joined on ``\\x1f`` —
strictly below every token character, so the string comparison equals
the elementwise piece-sequence comparison and the DuckDB replay orders
identically.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.analytics import tokens_col

PATH_SEP = "\x1f"


# ---------------------------------------------------------------------------
# pure-Python reference (shared by the trainer, the pandas UDF, tests)
# ---------------------------------------------------------------------------

def viterbi_segment(
    word: str,
    logp: dict[str, float],
    max_piece_len: int = 6,
) -> list[str] | None:
    """Best segmentation of ``word`` into vocab pieces: maximize summed
    log-prob; ties broken by fewer pieces, then the lexicographically
    smaller ``\\x1f``-joined piece sequence. Returns None only if some
    position is unreachable (cannot happen while every character is in
    the vocabulary)."""
    n = len(word)
    # (cost = -sum logp, n_pieces, joined_path, path)
    best: list[tuple | None] = [(0.0, 0, "", [])] + [None] * n
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            prev = best[j]
            if lp is None or prev is None:
                continue
            path = prev[3] + [piece]
            key = (prev[0] - lp, prev[1] + 1, PATH_SEP.join(path))
            if cand is None or key < cand[:3]:
                cand = (*key, path)
        best[i] = cand
    return None if best[n] is None else best[n][3]


def _logp_from_counts(counts: dict[str, int]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items()}


# ---------------------------------------------------------------------------
# corpus -> word histogram (the one corpus-sized pass)
# ---------------------------------------------------------------------------

def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — identical reduction to BPE's.
    One explode + one map-side-partial groupBy; every later training
    step is histogram-sized."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


# ---------------------------------------------------------------------------
# seed vocabulary
# ---------------------------------------------------------------------------

def seed_vocab(
    word_hist: DataFrame,
    max_piece_len: int = 6,
    seed_size: int = 1000,
) -> DataFrame:
    """Candidate pieces ``(piece, count)``: every substring of length
    2..max_piece_len scored by occurrence-weighted corpus frequency,
    top ``seed_size`` by (count desc, piece asc) — a bounded global
    top-k (TakeOrderedAndProject, never a partition-less window) —
    UNION all single characters with their exact counts (coverage).

    Substring generation is a per-row array expression over the
    DISTINCT-word histogram; the explode fans out to at most
    |word| * max_piece_len rows per distinct word."""
    ln = F.length(F.col("word"))
    pos = word_hist.select(
        "word", "freq",
        F.explode(F.sequence(F.lit(1), ln)).alias("i"))
    pieces = pos.select(
        "word", "freq", "i",
        F.explode(F.sequence(
            F.lit(1),
            F.least(F.lit(max_piece_len), F.length("word") - F.col("i")
                    + 1))).alias("l"),
    ).select(
        F.expr("substring(word, i, l)").alias("piece"),
        "freq", "l",
    )
    counts = pieces.groupBy("piece", "l").agg(
        F.sum("freq").alias("count"))
    multi = (
        counts.filter(F.col("l") >= 2)
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(seed_size)
        .select("piece", "count")
    )
    chars = counts.filter(F.col("l") == 1).select("piece", "count")
    return multi.unionByName(chars)


# ---------------------------------------------------------------------------
# hard-EM training rounds
# ---------------------------------------------------------------------------

def train_unigram(
    word_hist: DataFrame,
    seed: DataFrame,
    n_iter: int = 2,
    max_piece_len: int = 6,
) -> DataFrame:
    """Hard-EM over the word histogram: per round, Viterbi-segment each
    distinct word under the current vocabulary (Arrow-batched Python
    over HISTOGRAM rows — the 7th sanctioned vectorized-Python site,
    same class as BPE's encode), recount pieces with integer word
    frequencies, drop zero-count multi-char pieces, keep every char.
    Returns ``(piece, count)`` — final counts, ``count >= 1``.

    The vocabulary is collected+broadcast each round (bounded model
    state, see module docstring); the histogram itself never leaves
    the executors."""
    import pandas as pd

    counts = {r["piece"]: int(r["count"]) for r in seed.collect()}
    chars = {p for p in counts if len(p) == 1}
    spark = word_hist.sparkSession
    hist = word_hist.persist()
    try:
        for _ in range(n_iter):
            logp = _logp_from_counts(counts)
            bc = spark.sparkContext.broadcast(logp)
            mpl = max_piece_len

            def count_pieces(batches):
                lp = bc.value
                for pdf in batches:
                    tally: dict[str, int] = {}
                    for word, freq in zip(pdf["word"], pdf["freq"]):
                        segs = viterbi_segment(word, lp, mpl)
                        if segs is None:
                            segs = list(word)  # unreachable w/ chars
                        for p in segs:
                            tally[p] = tally.get(p, 0) + int(freq)
                    yield pd.DataFrame(
                        {"piece": list(tally), "c": list(tally.values())})

            new = (
                hist.mapInPandas(count_pieces, "piece string, c long")
                .groupBy("piece").agg(F.sum("c").alias("count"))
            )
            counts = {r["piece"]: int(r["count"]) for r in new.collect()}
            for ch in chars:  # coverage floor
                counts.setdefault(ch, 1)
    finally:
        hist.unpersist()
    out = [(p, c) for p, c in sorted(counts.items())]
    return spark.createDataFrame(out, "piece string, count long")


# ---------------------------------------------------------------------------
# corpus encoding
# ---------------------------------------------------------------------------

def unigram_vocab_dict(vocab: DataFrame) -> dict[str, float]:
    """(piece, count) -> piece log-probs (the broadcastable model)."""
    return _logp_from_counts(
        {r["piece"]: int(r["count"]) for r in vocab.collect()})


def unigram_encode_udf(logp: dict[str, float], max_piece_len: int = 6):
    """Arrow-batched encoder: text -> array<string> of pieces (words
    Viterbi-segmented independently, concatenated in order). Per-batch
    word memoization applies the histogram trick inside each batch.

    The piece log-prob model ships as a ``SparkContext.broadcast``
    handle, not a closure capture: a SentencePiece-scale vocabulary
    (32k-1M pieces) captured in the closure is re-pickled into every
    task's serialized UDF; the broadcast ships once per executor and
    the closure holds only the handle. Falls back to plain capture
    when no active session exists."""
    import re

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    tok_re = re.compile(r"[^a-z0-9]+")

    spark = SparkSession.getActiveSession()
    if spark is not None:
        bc = spark.sparkContext.broadcast(logp)

        def get_model():
            return bc.value
    else:  # pragma: no cover - factory used without a session
        def get_model():
            return logp

    def encode(texts):
        model = get_model()
        memo: dict[str, list[str]] = {}

        def enc(t):
            if t is None:
                return []
            out: list[str] = []
            for w in tok_re.split(t.lower()):
                if not w:
                    continue
                segs = memo.get(w)
                if segs is None:
                    segs = viterbi_segment(w, model, max_piece_len) \
                        or list(w)
                    memo[w] = segs
                out.extend(segs)
            return out

        return texts.map(enc)

    # explicit annotation objects: the module-level `from __future__
    # import annotations` stringifies inline hints, which pandas_udf
    # cannot resolve against this closure's locals
    encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(encode, "array<string>")


def unigram_token_counts(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """Per-document piece counts under a trained vocabulary —
    histogram-style: segment each DISTINCT word once (JVM-side join of
    the doc token stream against per-word piece counts), then one
    integer aggregate per doc. The per-word segmentation runs through
    the shared Python kernel over the distinct-word table only."""
    import pandas as pd

    logp = unigram_vocab_dict(vocab)
    words = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .distinct()
    )
    mpl = max_piece_len

    def n_pieces(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_pieces": [
                    len(viterbi_segment(w, logp, mpl) or list(w))
                    for w in pdf["word"]],
            })

    per_word = words.mapInPandas(n_pieces, "word string, n_pieces long")
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("word"))
    return (
        toks.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.sum("n_pieces").alias("n_pieces"),
             F.count(F.lit(1)).alias("n_words"))
    )
