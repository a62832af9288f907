"""Content-defined chunking: determinism, coverage, the boundary-shift
resistance property CDC exists for, bounds enforcement, and the Spark
chunk table + dedup rollup sharing the pure-Python kernel."""

from __future__ import annotations

import hashlib
import random

import pytest

from commoncrawl_spark.operators.cdc import (
    cdc_chunk_table,
    chunk_dedup_stats,
    gear_chunks_py,
)


def _blob(seed: int, n: int) -> bytes:
    return random.Random(seed).randbytes(n)


def test_chunks_cover_exactly_and_deterministically():
    blob = _blob(1, 200_000)
    c1 = gear_chunks_py(blob, avg_bits=10, min_len=64, max_len=8192)
    c2 = gear_chunks_py(blob, avg_bits=10, min_len=64, max_len=8192)
    assert c1 == c2
    # exact, gapless cover
    pos = 0
    for off, ln, dig in c1:
        assert off == pos
        assert dig == hashlib.sha1(blob[off:off + ln]).hexdigest()
        pos += ln
    assert pos == len(blob)
    # bounds hold for every chunk except possibly the final remainder
    for off, ln, _ in c1[:-1]:
        assert 64 <= ln <= 8192
    assert len(c1) > 10  # avg ~1 KiB over 200 KB: genuinely chunked


def test_boundary_shift_resistance():
    """THE CDC property: a 1-byte insertion near the front leaves the
    tail chunks identical (fixed-size blocking would change them all)."""
    blob = _blob(2, 150_000)
    shifted = blob[:10] + b"X" + blob[10:]
    d1 = [d for _, _, d in gear_chunks_py(blob, 10, 64, 8192)]
    d2 = [d for _, _, d in gear_chunks_py(shifted, 10, 64, 8192)]
    # all but the first few chunks re-align
    common = set(d1) & set(d2)
    assert len(common) >= len(d1) - 3
    assert d1[-1] == d2[-1]


def test_degenerate_inputs():
    assert gear_chunks_py(b"") == []
    assert gear_chunks_py(None) == []
    # wide mask -> no content cut fires in 3 bytes: one remainder chunk
    one = gear_chunks_py(b"abc", avg_bits=20, min_len=1, max_len=16)
    assert one == [(0, 3, hashlib.sha1(b"abc").hexdigest())]
    # constant bytes: max_len forces cuts, min/max respected
    const = gear_chunks_py(b"\x00" * 10_000, 8, 256, 1024)
    assert all(ln == 1024 for _, ln, _ in const[:-1])
    with pytest.raises(ValueError):
        gear_chunks_py(b"abc", min_len=0)


@pytest.mark.spark
def test_cdc_chunk_table_matches_kernel_and_dedups(spark):
    shared = _blob(3, 60_000)
    segs = [
        (1, shared + _blob(4, 5_000)),
        (2, _blob(5, 3_000) + shared),   # shifted copy of the shared run
        (3, _blob(6, 8_000)),
    ]
    df = spark.createDataFrame(segs, "segment_id long, payload binary")
    chunks = cdc_chunk_table(df, avg_bits=10, min_len=64, max_len=8192)
    rows = chunks.collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment_id"], []).append(
            (r["chunk_idx"], r["offset"], r["length"], r["sha1"]))
    for sid, blob in segs:
        want = gear_chunks_py(blob, 10, 64, 8192)
        got = sorted(by_seg[sid])
        assert [(o, ln, d) for _, o, ln, d in got] == want
    stats = chunk_dedup_stats(chunks).collect()[0]
    assert stats["logical_bytes"] == sum(len(b) for _, b in segs)
    # the shared 60 KB run dedups across the shifted copies
    assert stats["stored_bytes"] < stats["logical_bytes"] - 40_000
    assert stats["dedup_ratio"] < 0.75
