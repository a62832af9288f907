"""DUST-style irrelevant-query-parameter mining and URL collapse.

Different URLs with Similar Text (Bar-Yossef, Keidar & Schonfeld, "Do
Not Crawl in the DUST", WWW 2007) waste crawl budget: session ids,
tracking tags (``utm_*``), and ordering knobs mint unbounded distinct
URLs over identical content. The static blocklist approach (strip a
hand-curated param list, as ``canonicalize_url_col`` does for nothing
and ``alias_collapse`` does for redirects) misses site-specific params;
the DUST insight is that the rules can be MINED from crawl evidence:
a parameter is irrelevant on a host iff varying ONLY that parameter
never changed the fetched content.

This module implements the query-parameter fragment of DUST (the
highest-yield rule class; path-substitution rules are out of scope):

- :func:`mine_irrelevant_params` — from a ``(url, digest)`` capture
  table, for every ``(host, param)`` build *witness groups* (captures
  identical except for that param's value) and test each group for
  digest stability. Verdict: irrelevant iff >= ``min_support`` groups
  actually varied the value and ZERO groups saw the digest change.
- :func:`strip_irrelevant_params` — apply mined rules to a frontier:
  rebuild each URL without its host's irrelevant params, collapsing
  aliases BEFORE the seen-set/fetch stages spend budget on them.

Scale shape (10^10 captures, 1000 executors) — all Catalyst:

1. param explode is scan-stage (``split`` + ``posexplode``); the
   shuffled witness key is ``(host, param, md5(path + other-params))``
   — a fixed-width hash, never the fat URL tail;
2. group stats are one map-side-partial aggregation (two
   ``count_distinct`` over the witness key), verdicts a second slim
   aggregation on ``(host, param)`` — no windows, no self-joins;
3. rule application joins the frontier to the mined rules on ``host``
   with the per-host param list pre-aggregated to ONE array row per
   host, so the join side is tiny (hosts x irrelevant-params) and
   broadcastable; the rebuild is a scan-stage array ``filter`` +
   ``array_join``.

A same-URL recrawl that caught real content drift makes every param's
witness group look unstable; feed this miner captures from ONE
snapshot (or pre-dedup to the latest capture per URL) — the docstring
contract mirrors ``capture_change_stats``, which owns cross-snapshot
drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawl_spark.functions.urls import host_col

__all__ = ["mine_irrelevant_params", "strip_irrelevant_params"]


def _query_col(url: Column) -> Column:
    """Query string (no leading '?', no fragment); '' when absent."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def _base_col(url: Column) -> Column:
    """Everything before '?'/'#' — scheme+host+path, the group anchor."""
    return F.regexp_extract(url, r"^([^?#]*)", 1)


def mine_irrelevant_params(
    captures: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 2,
) -> DataFrame:
    """Mine per-host irrelevant query parameters from capture evidence.

    For every parameter occurrence, the *witness key* is the capture's
    base URL plus its OTHER parameters (sorted, so ``?a=1&b=2`` and
    ``?b=2&a=1`` witness together). Captures sharing a witness key
    differ only in this parameter; if their param values differ but
    their content digests agree, the group is positive evidence, and
    if the digests differ it is a violation — one violation kills the
    rule (strict DUST; noise tolerance belongs to the caller via input
    snapshotting, see module docstring).

    Returns one row per ``(host, param)`` seen with >= 1 witness group
    that varied the value::

        (host, param, evidence_groups, violation_groups, irrelevant)

    ``irrelevant = evidence_groups >= min_support AND
    violation_groups == 0``.
    """
    url = F.col(url_col)
    kvs = F.split(_query_col(url), "&")
    parsed = (
        captures
        .filter(_query_col(url) != "")
        .select(
            host_col(url).alias("host"),
            _base_col(url).alias("base"),
            F.col(digest_col).alias("digest"),
            kvs.alias("kvs"),
            F.explode(
                F.array_distinct(
                    F.transform(kvs, lambda kv: F.substring_index(kv, "=", 1))
                )
            ).alias("param"),
        )
    )
    # witness key: md5 of base + every kv NOT belonging to this param —
    # fixed-width, so the shuffle never carries long URL tails. pval is
    # the sorted serialization of this param's value(s) (a repeated
    # param varies as a unit).
    others = F.array_join(
        F.array_sort(F.filter(
            F.col("kvs"),
            lambda kv: F.substring_index(kv, "=", 1) != F.col("param"))),
        "&")
    pval = F.array_join(
        F.array_sort(F.filter(
            F.col("kvs"),
            lambda kv: F.substring_index(kv, "=", 1) == F.col("param"))),
        "&")
    witnessed = parsed.select(
        "host", "param",
        F.md5(F.concat_ws("", F.col("base"), others)).alias("witness"),
        pval.alias("pval"),
        "digest",
    )
    groups = (
        witnessed.groupBy("host", "param", "witness")
        .agg(
            F.count_distinct("pval").alias("n_vals"),
            F.count_distinct("digest").alias("n_digests"),
        )
    )
    return (
        groups.groupBy("host", "param")
        .agg(
            F.sum(F.when(F.col("n_vals") >= 2, 1).otherwise(0))
            .alias("evidence_groups"),
            F.sum(F.when((F.col("n_vals") >= 2) & (F.col("n_digests") > 1), 1)
                  .otherwise(0))
            .alias("violation_groups"),
        )
        .filter(F.col("evidence_groups") >= 1)
        .select(
            "host", "param", "evidence_groups", "violation_groups",
            ((F.col("evidence_groups") >= min_support)
             & (F.col("violation_groups") == 0)).alias("irrelevant"),
        )
    )


def strip_irrelevant_params(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "url_collapsed",
) -> DataFrame:
    """Apply mined rules: rebuild each URL without its host's irrelevant
    params (remaining params keep their original order; a URL whose
    params all die loses the '?'). Adds ``out_col``; rows on hosts with
    no rules pass through unchanged.

    ``rules`` is :func:`mine_irrelevant_params` output (or any frame
    with ``host``, ``param``, ``irrelevant``). The rules side collapses
    to one array row per host — corpus-tiny — and broadcasts.
    """
    url = F.col(url_col)
    per_host = (
        rules.filter(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("param")).alias("_dead_params"))
    )
    kvs = F.split(_query_col(url), "&")
    kept = F.filter(
        kvs,
        lambda kv: ~F.array_contains(
            F.col("_dead_params"), F.substring_index(kv, "=", 1)),
    )
    rebuilt = F.when(
        _query_col(url) == "", url
    ).when(
        F.size(kept) == 0, _base_col(url)
    ).otherwise(
        F.concat(_base_col(url), F.lit("?"), F.array_join(kept, "&"))
    )
    return (
        frontier.withColumn("_host", host_col(url))
        .join(F.broadcast(per_host.withColumnRenamed("host", "_host")),
              "_host", "left")
        .withColumn(
            out_col,
            F.when(F.col("_dead_params").isNull(), url).otherwise(rebuilt))
        .drop("_host", "_dead_params")
    )
