"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB shape this enables: distinct-count questions ("how many
unique URLs per host has this crawl ever seen?") answered WITHOUT
rescanning history. Each snapshot builds one fixed-size (~2^lgk bytes)
sketch per key at write time; any union of snapshots is answered by
merging sketches — a groupBy over tiny binary blobs — instead of a
count_distinct over the raw union, which at 10^10 URLs re-shuffles the
entire corpus every time the question is asked. Sketches are
commutative/associative (HLL registers combine by max), so merge order,
partitioning, and snapshot arrival order cannot change the result.

Accuracy contract: DataSketches HLL is EXACT while a key's cardinality
fits the sketch's sparse/coupon mode (thousands of values at lgk=12),
then degrades gracefully to ~1.04/sqrt(2^lgk) relative standard error
(~1.6% at lgk=12). The driver query's oracle leans on the exact regime
at test scale; ``tests/test_sketches.py`` pins the estimation-regime
tolerance at 200k distinct values.

All JVM-side declarative aggregates — map-side partial sketching, one
exchange on the key, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # ~1.6% RSE, 4 KiB dense sketch


def build_sketches(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch per key group over ``val_col``:
    ``(*key_cols, sketch binary, n_rows)``. Run once per snapshot at
    write time; the output is the compact, mergeable summary that makes
    every later distinct-count question history-free.

    Scale shape: hll_sketch_agg is a declarative aggregate — partial
    sketches build map-side and only (key, ~2^lgk-byte blob) rows cross
    the single exchange."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(val_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    *sketch_tables: DataFrame,
    key_cols: list[str],
    allow_different_lgk: bool = False,
) -> DataFrame:
    """Union N per-snapshot sketch tables and merge per key:
    ``(*key_cols, sketch, n_rows)`` where ``sketch`` covers every
    snapshot's values and ``n_rows`` sums raw row counts. Register-max
    merging makes this insensitive to order and to duplicate values
    across snapshots — the whole point: re-seen URLs don't double-count.

    ``allow_different_lgk`` permits merging sketches built at different
    precisions (the union downgrades to the coarsest), for rolling
    deployments where lgk changed between snapshots."""
    if not sketch_tables:
        raise ValueError("need at least one sketch table")
    u = sketch_tables[0]
    for t in sketch_tables[1:]:
        u = u.unionByName(t)
    return u.groupBy(*key_cols).agg(
        F.hll_union_agg(F.col("sketch"), F.lit(allow_different_lgk))
        .alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )


def estimate_cardinality(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct-count estimates from a sketch table:
    ``(*key_cols, distinct_est, n_rows)``. Metadata-cheap — one
    expression over blobs already the size of the key space, no
    exchange."""
    return df.select(
        *key_cols,
        F.hll_sketch_estimate(F.col("sketch")).alias("distinct_est"),
        "n_rows",
    )
