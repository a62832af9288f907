"""Inverted index: token posting lists + conjunctive (AND) retrieval.

A corpus engine needs both retrieval shapes:

- ``conjunctive_search``: the index-free path — one scan with an AND of
  ``array_contains`` predicates, whole-stage codegen, no shuffle. Right
  when queries are rare or the corpus is already in memory.
- ``build_postings`` / ``search_postings``: the indexed path — build
  ``(token, df, doc_ids)`` once (one distinct + one groupBy, shuffle
  rows are (token, id) pairs), persist it bucketed/sorted on token,
  then each query is a token-pruned scan of a few posting rows plus a
  tiny intersection. At web scale stopword postings are the hazard — a
  term in 10^10 documents is a 80 GB list — so ``max_df`` drops terms
  above a document-frequency ceiling at build time (searching a term
  everyone matches filters nothing anyway; the cap is the same guard
  mirrors/minhash use for ubiquitous keys).

All md5-free: postings are exact structures, no hashing involved, so
the DuckDB oracle is direct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analytics import tokens_col


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """``(token, df, doc_ids)`` with ``doc_ids`` sorted (deterministic).
    One (id, token) distinct + one groupBy on the token; ``max_df``
    drops ubiquitous terms at build time (see module docstring)."""
    dt = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).distinct()
    out = dt.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(F.collect_list(id_col)).alias("doc_ids"),
    )
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out


def search_postings(
    postings: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents present in EVERY queried term's posting list that
    EXISTS in the index, one ``id_col`` row each. Terms absent from the
    postings — dropped by ``max_df`` at build time — are ignored, which
    keeps this path consistent with ``conjunctive_search``'s "a term
    everyone matches filters nothing" rationale (a query of ONLY
    dropped terms returns empty: there is no list to scan). The token
    filter prunes to at most ``len(terms)`` posting rows before
    anything explodes; the intersection is a count-equals aggregate
    against the number of posting rows actually found (a 1-row
    broadcast, no driver action)."""
    terms = list(dict.fromkeys(terms))  # dedupe, preserve order
    if not terms:
        raise ValueError("terms must be non-empty")
    pruned = postings.filter(F.col("token").isin(terms))
    present = pruned.agg(
        F.count_distinct(F.col("token")).alias("_k"))
    hits = (
        pruned.select(F.explode("doc_ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .crossJoin(F.broadcast(present))
        .filter((F.col("_n") == F.col("_k")) & (F.col("_k") > 0))
        .select(id_col)
    )
    return hits


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase retrieval: documents containing the tokens of
    ``phrase`` CONSECUTIVELY, with the match count —
    ``(id_col, n_matches)``. The classic positional-postings trick: a
    phrase term at offset i occurring at position p contributes base
    position p - i; the phrase occurs wherever every slot shares a
    base, so the answer is one set-intersection fold per document —
    no self-joins, no window.

    Scale shape: one posexplode (slim (id, pos, token) rows) filtered
    to the phrase's tokens BEFORE the shuffle — the aggregate only sees
    rows for the queried terms; repeated terms in the phrase are
    handled per slot, not per token. Plan: filter -> one groupBy(id,
    slot) -> one groupBy(id), all map-side-partial until the fold."""
    phrase = list(phrase)
    if not phrase:
        raise ValueError("phrase must be non-empty")
    slots = F.array(*[
        F.struct(F.lit(t).alias("t"), F.lit(i).alias("i"))
        for i, t in enumerate(phrase)
    ])
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token"),
    )
    hits = (
        # isin prefilter BEFORE the slot fan-out: the corpus token
        # stream is multiplied by len(phrase) only for matching tokens,
        # not for the ~all tokens the equality filter would discard
        toks.filter(F.col("token").isin(list(set(phrase))))
        .select(id_col, "pos", "token", F.explode(slots).alias("s"))
        .filter(F.col("token") == F.col("s.t"))
        .select(id_col, F.col("s.i").alias("slot"),
                (F.col("pos") - F.col("s.i")).alias("base"))
    )
    per_slot = hits.groupBy(id_col, "slot").agg(
        F.collect_set("base").alias("bases"))
    # collect the slot arrays ONCE (a second collect_list would not be
    # guaranteed the same ordering), then fold the intersection
    collected = per_slot.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_k"),
        F.collect_list("bases").alias("_all"),
    )
    common = F.aggregate(
        F.slice(F.col("_all"), 2, len(phrase)),
        F.element_at(F.col("_all"), 1),
        lambda acc, a: F.array_intersect(acc, a),
    )
    return (
        collected.filter(F.col("_k") == len(phrase))
        .select(F.col(id_col), F.size(common).alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


def bm25_search(
    df: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ranked (disjunctive) retrieval with Okapi BM25 — the standard
    lexical ranking function: per matching term,
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, summed per document;
    returns the ``top_k`` as ``(id_col, score, rank)``.

    Determinism: the per-document sum folds over the term scores in
    token order (sorted collect + an explicit fold) so the float
    accumulation order is identical in any engine — a plain SUM leaves
    the order to the aggregator. Ranks tie-break on the id.

    Scale shape: one persisted (id, token) explode feeds document
    lengths and query-term tf; df per term falls out of tf for free
    (tf already has one row per (doc, term)); N/avgdl ride a 1-row
    broadcast and count EVERY input document — zero-token docs included
    (they shape idf and avgdl in true Okapi BM25). Only (id, token,
    count) rows shuffle; the final top-k is a single global sort of
    per-document scores — bounded by the number of documents matching
    ANY query term, not the corpus. The persisted token frame follows
    the module convention of lm/tfidf: MEMORY_AND_DISK, LRU-evicted,
    repeated callers own cleanup via ``spark.catalog.clearCache()``."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).persist()
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    # left join back to ALL ids: empty/null-text docs have dl = 0 and
    # must still count toward N and avgdl (true corpus-size BM25)
    doclen_full = (
        df.select(id_col).join(doclen, id_col, "left")
        .select(F.coalesce(F.col("_dl"), F.lit(0)).alias("_dl"))
    )
    globals_ = doclen_full.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"),
    )
    qt = toks.filter(F.col("token").isin(terms))
    tf = qt.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tf"))
    # tf has exactly one row per (doc, term): df is a tiny re-aggregate,
    # not a second distinct pass over the corpus token frame
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        1.0 + (F.col("_n").cast("double") - F.col("_df") + 0.5)
        / (F.col("_df").cast("double") + 0.5))
    term_score = idf * (
        F.col("_tf").cast("double") * (k1 + 1.0)
        / (F.col("_tf").cast("double")
           + k1 * (1.0 - b + b * F.col("_dl").cast("double")
                   / F.col("_avgdl")))
    )
    per_term = (
        tf.join(dfreq, "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(globals_))
        .select(F.col(id_col), F.col("token"), term_score.alias("_s"))
    )
    # deterministic accumulation: fold in token order, not SUM order
    folded = (
        per_term.groupBy(id_col)
        .agg(F.array_sort(
            F.collect_list(F.struct("token", "_s"))).alias("_ts"))
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    F.col("_ts"), F.lit(0.0),
                    lambda acc, x: acc + x["_s"]),
                6).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        folded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def conjunctive_search(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Index-free AND search: one codegen scan, no shuffle — every
    predicate is an ``array_contains`` over the token array."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens_col(F.col(text_col))
    cond = None
    for t in terms:
        c = F.array_contains(toks, t)
        cond = c if cond is None else (cond & c)
    return df.filter(cond).select(id_col)
