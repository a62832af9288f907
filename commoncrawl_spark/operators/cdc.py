"""Content-defined chunking (CDC) for archive-level binary dedup.

Fixed-size blocking breaks on the *boundary-shift problem*: insert one
byte near the front of a re-downloaded WARC segment and every
subsequent fixed block changes, so block-hash dedup finds nothing. CDC
(Muthitacharoen et al., "A Low-bandwidth Network File System", SOSP
2001; FastCDC, Xia et al., USENIX ATC 2016) cuts where the CONTENT
says to — a rolling hash over a small window declares a boundary when
its low bits hit a pattern — so an insertion only perturbs the chunk it
lands in and its immediate neighbor; every later chunk re-aligns and
deduplicates. This is how archive/backup systems (and CC-scale WARC
storage) dedup re-crawled bytes that are near- but not bit-identical.

The chunker is the Gear variant (FastCDC's base): per byte,
``h = ((h << 1) + GEAR[b]) & 0xFFFFFFFF``; a boundary fires past
``min_len`` when ``h & mask == 0`` (mask = ``2^avg_bits - 1``, giving
~``2^avg_bits``-byte average chunks), with a hard ``max_len`` cut. The
GEAR table is derived from md5 of the byte value — fully deterministic,
no RNG, so chunkings are reproducible across runs/engines.

Scale shape (10^8 segments, 1000 executors):
- chunking is ``mapInPandas`` — a sanctioned Arrow-batched Python site
  (rolling byte-level hashing has no Catalyst equivalent); payload
  bytes move zero-copy into the worker and only slim
  ``(id, idx, offset, length, sha1)`` rows come back — the chunk BYTES
  never leave the executor, dedup happens on 20-byte digests;
- the dedup rollup is one hash exchange on the chunk digest
  (map-side-partial count/sum) — the exact-dedup shape at chunk grain;
- Arrow batch sizing for fat binaries is the session-level contract
  (session.py pins byte-sized batches).

Pure-Python kernel and Spark operator share ``gear_chunks_py`` — the
pytest oracle and the executor run the same code path.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gear_chunks_py", "cdc_chunk_table", "chunk_dedup_stats"]

# deterministic 256-entry gear table: md5(byte value), first 4 bytes
GEAR = tuple(
    int.from_bytes(hashlib.md5(bytes([i])).digest()[:4], "big")
    for i in range(256)
)


def gear_chunks_py(
    blob: bytes,
    avg_bits: int = 12,
    min_len: int = 256,
    max_len: int = 65536,
) -> list[tuple[int, int, str]]:
    """Chunk one byte string; returns ``[(offset, length, sha1_hex)]``.
    Deterministic pure function — the executor kernel AND the test
    oracle. Empty/None blobs chunk to []."""
    if not blob:
        return []
    if min_len < 1 or max_len < min_len:
        raise ValueError(f"bad chunk bounds: min={min_len} max={max_len}")
    mask = (1 << avg_bits) - 1
    out: list[tuple[int, int, str]] = []
    start = 0
    h = 0
    n = len(blob)
    for i in range(n):
        h = ((h << 1) + GEAR[blob[i]]) & 0xFFFFFFFF
        length = i - start + 1
        if (length >= min_len and (h & mask) == 0) or length >= max_len:
            out.append((start, length,
                        hashlib.sha1(blob[start:i + 1]).hexdigest()))
            start = i + 1
            h = 0
    if start < n:
        out.append((start, n - start,
                    hashlib.sha1(blob[start:]).hexdigest()))
    return out


def cdc_chunk_table(
    segments: DataFrame,
    bin_col: str = "payload",
    id_col: str = "segment_id",
    avg_bits: int = 12,
    min_len: int = 256,
    max_len: int = 65536,
) -> DataFrame:
    """``(id, payload: binary)`` -> one row per chunk:
    ``(id_col, chunk_idx, offset, length, sha1)``. The payload bytes
    stay on the executor; only digests and coordinates return."""
    schema = (f"{id_col} {segments.schema[id_col].dataType.simpleString()},"
              " chunk_idx int, offset long, length long, sha1 string")

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[id_col], pdf[bin_col]):
                blob = bytes(blob) if blob is not None else b""
                for idx, (off, ln, dig) in enumerate(
                        gear_chunks_py(blob, avg_bits, min_len, max_len)):
                    rows.append((sid, idx, off, ln, dig))
            yield pd.DataFrame(
                rows, columns=[id_col, "chunk_idx", "offset", "length",
                               "sha1"])

    return segments.select(id_col, bin_col).mapInPandas(chunk, schema)


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Chunk-level dedup ledger from a :func:`cdc_chunk_table` result:
    one row — total vs unique chunk counts and bytes, and the dedup
    ratio (stored/logical, rounded 6dp). One digest-keyed exchange."""
    uniq = (
        chunks.groupBy("sha1")
        .agg(F.first("length").alias("length"),
             F.count(F.lit(1)).alias("copies"))
    )
    return (
        uniq.agg(
            F.sum("copies").alias("total_chunks"),
            F.count(F.lit(1)).alias("unique_chunks"),
            F.sum(F.col("copies") * F.col("length")).alias("logical_bytes"),
            F.sum("length").alias("stored_bytes"),
        )
        .select(
            "total_chunks", "unique_chunks", "logical_bytes",
            "stored_bytes",
            F.round(F.col("stored_bytes") / F.col("logical_bytes"), 6)
            .alias("dedup_ratio"),
        )
    )
