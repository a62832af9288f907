"""Document chunking for training: fixed-token sliding windows.

The last pipeline stage before tokenization proper — pre-training
loaders consume fixed-size windows (e.g. 512 tokens with a 64-token
overlap), not whole documents. Chunking here is a per-row array
expression: split to words, generate window starts, slice — no shuffle,
no Python, so it composes into the scan stage of the export job
(typically right before ``tables.write_shards``).

Word joins use a single space, which normalizes intra-document
whitespace; run ``functions.text.normalize_text_col`` first when the
source whitespace is meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words_col(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """Slide a ``chunk_tokens``-word window over every document with
    step ``stride`` (default: no overlap, stride = chunk_tokens).
    Output one row per chunk: ``(id_col, chunk_id, n_tokens, chunk)``
    with ``chunk_id`` the 0-based window ordinal. The final window may
    be shorter than ``chunk_tokens`` (the tail); windows under
    ``min_tokens`` words are dropped. Empty documents produce no rows.

    Window starts are ``1 + i * stride`` for ``i in [0, n_windows)``
    with ``n_windows = 1 + ceil(max(0, n - chunk_tokens) / stride)`` —
    every word is covered, no start lies past the document, and when
    the overhang divides evenly the last window is exactly full.
    """
    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # windows would skip words, silently dropping training data —
        # the docstring's every-word-covered guarantee needs overlap<=0
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) would "
            "leave words uncovered")
    # the word split is bound to a real column so the window lambda
    # reads an attribute — an expression referenced inside a
    # higher-order-function lambda is re-evaluated per element (codegen
    # does not hoist it), which here would re-split the document once
    # per window (measured 4x slower at 64-token windows)
    words = F.col("_words")
    n = F.size(words)
    n_windows = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0))
                 / F.lit(stride)).cast("int")
    )
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_windows - 1),
            lambda i: F.slice(words, i * stride + 1, chunk_tokens),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    out = (
        df.select(F.col(id_col), _words_col(F.col(text_col)).alias("_words"))
        .select(id_col, chunks.alias("_chunks"))
        .select(id_col, F.posexplode("_chunks").alias("chunk_id", "_w"))
        .select(
            id_col,
            "chunk_id",
            F.size("_w").alias("n_tokens"),
            F.concat_ws(" ", "_w").alias("chunk"),
        )
    )
    return out.filter(F.col("n_tokens") >= min_tokens)


def pack_sequences(
    df: DataFrame,
    seq_tokens: int = 2048,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    text_col: str = "text",
    eod_tokens: int = 1,
) -> DataFrame:
    """GPT-style sequence packing — the loader-side stage between
    chunking and training: concatenate every document's token stream
    (plus ``eod_tokens`` end-of-document separators) WITHIN a shard in
    ``id_col`` order, then slice the stream into fixed ``seq_tokens``
    training sequences. Short documents share a sequence instead of
    being padded (the packing that makes web corpora trainable — mean
    web doc ~400 tokens vs 2k-8k contexts, so padding would waste 80%+
    of every batch); long documents span several sequences.

    Output: one row per (document x sequence it intersects) —
    ``(shard_col, seq_id, id_col, doc_start, n_tokens, seq_pos)``:
    tokens ``[doc_start, doc_start + n_tokens)`` of the document land
    at position ``seq_pos`` of sequence ``seq_id``. The separator
    advances the stream but is never mapped (the loader emits its own
    EOD ids). Deterministic: a pure function of (shard, id, token
    count), so re-runs, repartitions, and engines agree bit-for-bit.
    Empty documents are dropped (they would contribute bare separators
    and shift every later offset on a rerun against a filtered copy).

    Scale shape (10^10 docs, 1000 executors):
    - the ONLY exchange is the hash partition on the shard key for the
      per-shard running sum; the window is PARTITIONED (never the
      banned partition-less global sort) and a shard is loader-sized
      by the same contract as ``tables.write_shards`` — thousands of
      docs, one task each, perfectly parallel across millions of
      shards;
    - the sequence explode is a per-row array expression over the
      handful of sequences a document touches (``n/seq_tokens + 1``);
    - offsets are exact: the running sum stays integral (``div``, not
      float division), so packing is stable past 2^53 stream tokens.

    Returns ``(shard_col, seq_id, id_col, doc_start, n_tokens,
    seq_pos)`` with ``seq_id`` numbered per shard from 0.
    """
    if seq_tokens <= 0:
        raise ValueError("seq_tokens must be positive")
    if eod_tokens < 0:
        raise ValueError("eod_tokens must be >= 0")
    from pyspark.sql import Window

    # second sort key: duplicate ids within a shard (repeat captures)
    # would otherwise keep shuffle arrival order and make every later
    # offset run-dependent — the wet_segments duplicate-url argument;
    # equal (id, n) twins are interchangeable (identical spans)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col, "_n")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = (
        df.select(
            shard_col, id_col,
            F.size(_words_col(F.col(text_col))).cast("long").alias("_n"),
        )
        .filter(F.col("_n") > 0)
    )
    off = sized.withColumn(
        "_off",
        F.coalesce(F.sum(F.col("_n") + eod_tokens).over(w), F.lit(0)),
    )
    spans = off.select(
        shard_col, id_col, "_n", "_off",
        F.explode(
            F.sequence(
                F.expr(f"_off div {seq_tokens}"),
                F.expr(f"(_off + _n - 1) div {seq_tokens}"),
            )
        ).alias("seq_id"),
    )
    g_start = F.greatest(F.col("_off"), F.col("seq_id") * seq_tokens)
    g_end = F.least(
        F.col("_off") + F.col("_n"), (F.col("seq_id") + 1) * seq_tokens)
    return spans.select(
        shard_col,
        "seq_id",
        id_col,
        (g_start - F.col("_off")).alias("doc_start"),
        (g_end - g_start).alias("n_tokens"),
        (g_start - F.col("seq_id") * seq_tokens).alias("seq_pos"),
    )


# ---------------------------------------------------------------------------
# T5 span corruption (deterministic windowed variant)
# ---------------------------------------------------------------------------


def span_corruption(
    df: DataFrame,
    window: int = 20,
    span: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The T5 pre-training objective (Raffel et al. JMLR'20 §3.1.4)
    as a DETERMINISTIC windowed transform: the token stream splits
    into fixed ``window``-token blocks and each complete block loses
    ONE ``span``-token run at an md5-derived offset, replaced by its
    ``<extra_id_k>`` sentinel; targets are sentinel + removed run per
    block plus the terminal sentinel. Corruption rate is exactly
    span/window (3/20 = T5's 15%) over complete blocks; the tail
    (< window tokens) passes through uncorrupted. T5 samples spans
    i.i.d., which is irreproducible across engines AND forces a
    sequential non-overlap scan; fixed blocks make non-overlap true
    by construction, keep the rate exact, and let every offset be
    md5(id|block) arithmetic both engines replay bit-for-bit.

    Output: ``(id_col, n_tokens, n_spans, input_text, target_text)``.
    Scale shape: per-row array lambdas over the token split — zero
    exchanges, zero Python; 10^10 docs corrupt in their scan stage,
    composing with chunk_documents/write_shards like the other
    export steps."""
    if span < 1 or window <= span:
        raise ValueError(f"need window > span >= 1, got {window}/{span}")
    toks = _words_col(F.col(text_col))
    n = F.size(toks)
    n_win = F.floor(n / window).cast("int")
    offs_mod = window - span + 1

    def off(w: Column) -> Column:
        # md5-derived offset in [0, window-span]; same conv arithmetic
        # as the CMS buckets so DuckDB replays it exactly
        h = F.conv(F.substring(F.md5(F.concat(
            F.col(id_col).cast("string"), F.lit("|"),
            w.cast("string"))), 1, 8), 16, 10).cast("long")
        return (h % offs_mod).cast("int")

    def sentinel(w: Column) -> Column:
        return F.concat(F.lit("<extra_id_"), w.cast("string"), F.lit(">"))

    def win_slice(w: Column, start_in_win: Column, length: Column) -> Column:
        return F.slice(toks, w * window + start_in_win + 1, length)

    # sequence(0, -1) in Spark yields [0, -1] (auto negative step), so
    # the zero-complete-windows case guards the sequence itself
    ws = F.when(n_win > 0, F.sequence(F.lit(0), n_win - 1)) \
        .otherwise(F.array().cast("array<int>"))
    inp_blocks = F.transform(ws, lambda w: F.concat(
        win_slice(w, F.lit(0), off(w)),
        F.array(sentinel(w)),
        win_slice(w, off(w) + span, F.lit(window) - off(w) - span)))
    tgt_blocks = F.transform(ws, lambda w: F.concat(
        F.array(sentinel(w)), win_slice(w, off(w), F.lit(span))))
    tail = F.slice(toks, n_win * window + 1, n - n_win * window)
    inputs = F.concat(F.flatten(inp_blocks), tail)
    targets = F.concat(F.flatten(tgt_blocks), F.array(sentinel(n_win)))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_win.cast("long").alias("n_spans"),
        F.array_join(inputs, " ").alias("input_text"),
        F.array_join(targets, " ").alias("target_text"),
    )
