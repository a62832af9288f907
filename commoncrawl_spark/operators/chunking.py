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
