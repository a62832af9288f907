"""Focused-crawl frontier scoring (shark-search).

A topical crawl doesn't fetch breadth-first — it scores each frontier
candidate by how likely its NEIGHBORHOOD is to be on-topic. The
shark-search algorithm (Hersovici et al., "The shark-search algorithm
— an application: tailored Web site mapping", WWW 1998, refining
De Bra's fish-search) combines three signals for a child URL:

- *inherited* relevance: a decayed copy of the parent page's topical
  score (children of relevant pages tend to be relevant),
- *anchor* relevance: query-term overlap with the link's anchor text
  (the strongest local signal — publishers describe the target),
- *context* relevance: the parent score standing in for the text
  around the link (this batch variant uses the parent's page score as
  the anchor-context proxy, the common simplification when the link
  extractor keeps anchors but not context windows).

    inherited    = delta * parent_relevance
    neighborhood = beta * anchor_score + (1 - beta) * parent_relevance
    potential    = gamma * inherited + (1 - gamma) * neighborhood

A child reachable from several parents takes its BEST potential (max),
plus the argmax parent for lineage. Feed the result into
``schedule.select_polite_batch`` as the priority column — politeness
still caps per host; shark-search only decides what is worth the
budget.

Scale shape (10^10 links, 1000 executors) — all Catalyst:

1. anchor scoring is scan-stage (token split + ``array_intersect``
   against a literal term array — terms are a QUERY, corpus-tiny);
2. parent relevance arrives via ONE equi-join on the parent URL (the
   scores side is slim ``(url, relevance)``);
3. the per-child max is one map-side-partial ``max_by`` aggregation on
   ``dst`` — no windows, no self-joins, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawl_spark.operators.analytics import tokens_col

__all__ = ["anchor_relevance_col", "focused_frontier"]


def anchor_relevance_col(anchor: Column, query_terms: list[str]) -> Column:
    """Fraction of query terms present in the anchor text's token set
    (0.0 for empty/missing anchors). Terms are matched through the same
    tokenizer the corpus operators use (``tokens_col``), so 'Data
    Pipelines!' hits the term 'pipelines'."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = F.array(*[F.lit(t.lower()) for t in sorted(set(query_terms))])
    toks = tokens_col(F.coalesce(anchor, F.lit("")))
    return (
        F.size(F.array_intersect(F.array_distinct(toks), terms))
        / F.lit(float(len(set(query_terms))))
    )


def focused_frontier(
    scored_pages: DataFrame,
    links: DataFrame,
    query_terms: list[str],
    delta: float = 0.5,
    beta: float = 0.8,
    gamma: float = 0.5,
    src_col: str = "src_url",
    dst_col: str = "abs_url",
    anchor_col: str = "anchor",
    url_col: str = "url",
    relevance_col: str = "relevance",
) -> DataFrame:
    """Score frontier candidates with the shark-search potential.

    ``scored_pages`` is ``(url, relevance)`` with relevance in [0, 1]
    (keyword match, NB/logreg classifier probability — any topical
    scorer); ``links`` is the edge table with anchor text
    (``links.extract_anchors`` shape). Links whose parent has no score
    row are dropped — an unscored parent is an uncrawled page, and
    shark-search only expands from visited pages.

    Returns one row per distinct child URL::

        (url, potential, inherited, neighborhood, best_parent)

    with ``potential`` the max over parents and ``best_parent`` the
    parent achieving it (ties break to the smaller parent URL, so the
    result is deterministic and oracle-checkable).
    """
    for name, v in (("delta", delta), ("beta", beta), ("gamma", gamma)):
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"{name} must be in [0, 1], got {v}")
    parents = scored_pages.select(
        F.col(url_col).alias("_parent"),
        F.col(relevance_col).cast("double").alias("_rel"),
    )
    e = links.select(
        F.col(src_col).alias("_parent"),
        F.col(dst_col).alias("url"),
        anchor_relevance_col(F.col(anchor_col), query_terms).alias("_anchor"),
    )
    scored = (
        e.join(parents, "_parent")
        .select(
            "url", "_parent",
            (F.lit(delta) * F.col("_rel")).alias("_inherited"),
            (F.lit(beta) * F.col("_anchor")
             + F.lit(1.0 - beta) * F.col("_rel")).alias("_neighborhood"),
        )
        .withColumn(
            "_potential",
            F.lit(gamma) * F.col("_inherited")
            + F.lit(1.0 - gamma) * F.col("_neighborhood"),
        )
    )
    # per-child argmax: one map-side-partial max_by; the (-potential,
    # parent) struct makes the tie-break (max potential, then MIN
    # parent url) a single deterministic ordering
    pick = F.struct(
        (-F.col("_potential")).alias("np"), F.col("_parent").alias("p"))
    return (
        scored.groupBy("url")
        .agg(
            F.max("_potential").alias("potential"),
            F.min_by(
                F.struct(
                    F.col("_inherited").alias("inherited"),
                    F.col("_neighborhood").alias("neighborhood"),
                    F.col("_parent").alias("best_parent"),
                ),
                pick,
            ).alias("_best"),
        )
        .select(
            "url", "potential",
            F.col("_best.inherited").alias("inherited"),
            F.col("_best.neighborhood").alias("neighborhood"),
            F.col("_best.best_parent").alias("best_parent"),
        )
    )
