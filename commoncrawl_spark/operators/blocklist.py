"""Host/domain blocklist filtering (UT1-style): a URL is blocked when
its host equals a blocked domain or is any subdomain of one.

Reference analog: the reference pipeline scopes crawls with a hardcoded
positive filter (``url=theguardian.com/*`` in create_tasks.py); curation
pipelines need the negative form at web scale — a list of ~10^6 blocked
registrable domains (adult/malware lists) applied to every discovered
URL.

Scale shape: suffix matching is NOT a LIKE join (a non-equi condition
against 10^6 domains would plan as a broadcast nested loop — |urls| x
|blocklist| comparisons). Instead each host explodes into its ≤
``max_levels`` dot-suffixes (``a.b.site.test`` -> ``b.site.test``,
``site.test``, ...) and the check becomes a broadcast EQUI semi-join on
the suffix: per-row work is bounded by label count, the blocklist
broadcasts once (~30 MB at UT1 size), and nothing shuffles except the
blocked-key set for the final anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_col


def host_suffixes_col(host: Column, min_labels: int = 2) -> Column:
    """All dot-suffixes of ``host`` with at least ``min_labels`` labels,
    plus the host itself — e.g. ``a.b.site.test`` ->
    ``[a.b.site.test, b.site.test, site.test]``. Pure array expressions,
    no Python."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.filter(
        F.transform(
            F.sequence(F.lit(min_labels), F.greatest(n, F.lit(min_labels))),
            lambda k: F.when(
                k <= n, F.concat_ws(".", F.slice(parts, n - k + 1, k))),
        ),
        lambda s: s.isNotNull(),
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    invert: bool = False,
) -> DataFrame:
    """Drop rows whose URL's host matches the blocklist (equal to, or a
    subdomain of, any blocked domain). ``invert=True`` returns the
    blocked rows instead (audit mode). Schema is preserved."""
    host = host_col(F.col(url_col))
    exploded = df.select(
        F.col(url_col).alias("_u"),
        F.explode(host_suffixes_col(host)).alias("_suffix"),
    )
    blocked_urls = (
        exploded.join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("_suffix"))),
            "_suffix",
            "left_semi",
        )
        .select(F.col("_u").alias(url_col))
        .distinct()
    )
    how = "left_semi" if invert else "left_anti"
    return df.join(blocked_urls, url_col, how)


def url_word_scores(
    df: DataFrame,
    weighted_terms: dict[str, float],
    strict_terms: list[str] | None = None,
    threshold: float = 1.0,
    url_col: str = "url",
) -> DataFrame:
    """RefinedWeb-style weighted URL word filtering (Penedo et al. 2023
    §G.1, the UT1-complement): beyond domain blocklists, a URL is
    suspect when its OWN text contains flagged words — soft-scored, so
    "essex.edu" (substring hit) survives while "casino-poker-slots.biz"
    (three weighted token hits) dies.

    Two signals per URL:

    - **soft score**: the URL splits into lowercase alphanumeric
      tokens; ``score = Σ weight(token)`` counting multiplicity. The
      weights map becomes a LITERAL Catalyst map (curation word lists
      are ~10^3-10^4 entries — query-sized), so scoring is a pure
      scan-stage array fold: zero shuffle, zero Python, no join at all.
    - **strict hit**: any of ``strict_terms`` appearing as a SUBSTRING
      anywhere in the lowercased URL (the unambiguous-word list that
      blocks even inside concatenated domain labels).

    ``blocked = strict_hit OR score >= threshold``. Returns the input
    plus ``(url_score, strict_hit, blocked)`` — filter or audit at the
    call site.
    """
    if not weighted_terms:
        raise ValueError("weighted_terms must be non-empty")
    lowered = F.lower(F.col(url_col))
    tokens = F.filter(F.split(lowered, "[^a-z0-9]+"), lambda t: t != "")
    weights = F.create_map(
        *[F.lit(x) for kv in sorted(weighted_terms.items())
          for x in (kv[0].lower(), float(kv[1]))])
    score = F.aggregate(
        tokens, F.lit(0.0),
        lambda acc, t: acc + F.coalesce(weights[t], F.lit(0.0)))
    strict = F.lit(False)
    for s in sorted(set(strict_terms or [])):
        strict = strict | lowered.contains(s.lower())
    return (
        df.withColumn("url_score", score)
        .withColumn("strict_hit", strict)
        .withColumn(
            "blocked",
            F.col("strict_hit") | (F.col("url_score") >= threshold))
    )
