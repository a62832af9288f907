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
from ..materialize import materialize as _materialize


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
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token"),
    )
    return _phrase_match(toks, phrase, id_col)


def _phrase_match(
    toks: DataFrame, phrase: Sequence[str], id_col: str
) -> DataFrame:
    """Shared base-offset intersection over a ``(id, pos, token)``
    stream — the tail of :func:`phrase_search`, also fed by
    :func:`phrase_search_indexed` from persisted positional postings."""
    slots = F.array(*[
        F.struct(F.lit(t).alias("t"), F.lit(i).alias("i"))
        for i, t in enumerate(phrase)
    ])
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

    Scale shape: document length is a SCAN-STAGE expression —
    ``size(tokens)`` per row, no explode, no shuffle, nulls/empties
    count as 0 so every document shapes N and avgdl (true corpus-size
    Okapi BM25). Query-term tf is the only explode, filtered to the
    query terms BEFORE its shuffle; df per term falls out of tf for
    free (tf already has one row per (doc, term)). Nothing is persisted
    or checkpointed — the corpus token stream is never materialized,
    so the operator is stateless (no cache lifecycle, r03). The final
    top-k is a parallel partial top-k (per-partition k-row heaps, k
    rows per partition cross the exchange) — never a global sort,
    never a partition-less window."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    dl = F.coalesce(
        F.size(tokens_col(F.col(text_col))).cast("long"), F.lit(0))
    doclen = df.select(F.col(id_col), dl.alias("_dl"))
    globals_ = doclen.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"),
    )
    tf = (
        df.select(
            F.col(id_col),
            F.explode(tokens_col(F.col(text_col))).alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tf"))
    )
    return _bm25_rank(tf, doclen, globals_, k1, b, top_k, id_col)


def _bm25_rank(
    tf: DataFrame,
    doclen: DataFrame,
    globals_: DataFrame,
    k1: float,
    b: float,
    top_k: int,
    id_col: str,
    df_precomputed: bool = False,
) -> DataFrame:
    """Shared BM25 scoring tail: ``tf`` is ``(id, token, _tf)`` already
    restricted to the query terms, ``doclen`` is ``(id, _dl)``,
    ``globals_`` a 1-row ``(_n, _avgdl)`` frame. Fed by the scan path
    (:func:`bm25_search`), the persisted-index path
    (:func:`bm25_search_indexed`), and — with ``df_precomputed`` — the
    pruned path (:func:`bm25_search_champion`), whose tf rows carry the
    TRUE document frequency as a ``_df`` column stamped at build time
    (recounting over the pruned lists would understate df and inflate
    idf)."""
    if df_precomputed:
        scored = tf
    else:
        # tf has exactly one row per (doc, term): df is a tiny
        # re-aggregate, not a second distinct pass over the corpus
        # token frame
        dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
        scored = tf.join(dfreq, "token")
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
        scored
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
    # top-k via orderBy().limit(): each task keeps a k-row heap and only
    # k rows per partition cross the exchange (TakeOrderedAndProject /
    # LocalLimit-then-GlobalLimit). A partition-less row_number window
    # here would funnel EVERY matching document through one task —
    # corpus-scale for a common term. Ranks are then derived WITHOUT a
    # window at all: the <= top_k survivors fold into one bounded array
    # (k elements, not corpus rows) and posexplode restores (rank, row),
    # so no plan in this module ever contains a partition-less Window.
    return _rank_bounded(
        folded.orderBy(F.desc("score"), F.asc(id_col)).limit(top_k),
        id_col,
    )


def _rank_bounded(topk: DataFrame, id_col: str) -> DataFrame:
    """(id, score) -> (id, score, rank) for an already-LIMIT-bounded
    frame, ordered by (score desc, id asc), window-free: one global
    collect_list over <= k rows (bounded by the upstream limit, never
    by the corpus) + array_sort + posexplode."""
    row = F.struct(
        (-F.col("score")).alias("_ns"),
        F.col(id_col).alias("_id"),
        F.col("score").alias("_sc"),
    )
    return (
        topk.select(row.alias("_r"))
        .groupBy()
        .agg(F.array_sort(F.collect_list("_r")).alias("_rs"))
        .select(F.posexplode("_rs").alias("_pos", "_r"))
        .select(
            F.col("_r._id").alias(id_col),
            F.col("_r._sc").alias("score"),
            (F.col("_pos") + 1).alias("rank"),
        )
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


# ---------------------------------------------------------------------------
# Index-once / search-many: builders whose output is meant to be PERSISTED
# (parquet/Iceberg, ideally bucketed+sorted on token via
# ``tables.write_bucketed``) and search functions that consume the persisted
# tables WITHOUT ever re-reading or re-tokenizing the corpus. At 100 TB you
# tokenize once; every query after that is a token-pruned scan of slim
# posting rows — the predicate on ``token`` pushes into the parquet scan,
# so a 3-term query reads 3 tokens' worth of postings, not the index.
# ---------------------------------------------------------------------------


def build_tf_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    with_dl: bool = False,
) -> DataFrame:
    """Term-frequency index ``(token, id, tf)`` — the BM25-ready
    sibling of :func:`build_postings` (which keeps only membership).
    One explode + one groupBy; ``max_df`` drops ubiquitous terms at
    build time with the same rationale as ``build_postings``.

    ``with_dl=True`` adds the document length as a ``dl`` column
    riding every posting: it is computed from the SAME token array at
    explode time (one ``size()``, no second tokenize) and carried
    through the groupBy as ``first(dl)`` — so consumers that need
    per-posting length normalization (:func:`build_block_max`) skip an
    entire postings-sized exchange on the id key that a join against
    ``build_doclen`` would cost. The column denormalizes one long per
    posting — the classic impact-ordered-index tradeoff."""
    if with_dl:
        toks = df.select(
            F.col(id_col), tokens_col(F.col(text_col)).alias("_t"))
        tf = (
            toks.select(
                F.col(id_col),
                F.explode(F.col("_t")).alias("token"),
                F.size(F.col("_t")).cast("long").alias("dl"),
            )
            .groupBy("token", id_col)
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.first("dl").alias("dl"))
        )
    else:
        tf = (
            df.select(
                F.col(id_col),
                F.explode(tokens_col(F.col(text_col))).alias("token"),
            )
            .groupBy("token", id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    if max_df is not None:
        dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
        tf = (
            tf.join(dfreq.filter(F.col("_df") <= max_df), "token")
            .drop("_df")
        )
    return tf.select("token", id_col, "tf",
                     *(["dl"] if with_dl else []))


def build_doclen(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-length table ``(id, dl)`` for EVERY input document —
    zero-token and null-text docs included with ``dl = 0`` (they shape
    N and avgdl in true Okapi BM25). Pure scan-stage expression, no
    shuffle: ``dl = size(tokens)`` is the same token count the explode
    in :func:`build_tf_index` produces, without the explode."""
    dl = F.coalesce(
        F.size(tokens_col(F.col(text_col))).cast("long"), F.lit(0)
    )
    return df.select(F.col(id_col), dl.alias("dl"))


def build_positional_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional postings ``(token, id, positions)`` with positions
    sorted — what :func:`phrase_search_indexed` consumes. One
    posexplode + one groupBy on (token, id); position lists are the
    per-(token, doc) occurrence offsets, so total index size equals the
    token stream, stored grouped."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token"),
        )
        .groupBy("token", id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )


def bm25_search_indexed(
    tf_index: DataFrame,
    doclen: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 over a PREBUILT index: identical math and results to
    :func:`bm25_search` (same deterministic token-order fold, same
    window-free bounded top-k), but the corpus is never touched —
    ``tf_index`` is :func:`build_tf_index` output and ``doclen`` is
    :func:`build_doclen` output, read back from storage. The
    ``token IN (...)`` filter pushes into the index scan, so the query
    reads only the queried terms' rows plus the slim doclen table."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    dl = doclen.select(F.col(id_col), F.col("dl").alias("_dl"))
    globals_ = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"),
    )
    tf = tf_index.filter(F.col("token").isin(terms)).select(
        F.col(id_col), F.col("token"), F.col("tf").alias("_tf")
    )
    return _bm25_rank(tf, dl, globals_, k1, b, top_k, id_col)


def _merge_replacing(
    old: DataFrame,
    new: DataFrame,
    new_ids: DataFrame,
    id_col: str,
    broadcast_new_ids: bool = True,
) -> DataFrame:
    """Union ``old`` and ``new`` index rows with NEW-WINS-PER-DOCUMENT
    semantics: every old row belonging to a document present in the new
    segment is dropped first (a re-crawled page replaces ALL its former
    index rows — its token set changed), then the new rows are appended.

    Scale shape: the anti-join key is the slim id set of the NEW segment
    — a daily crawl increment is orders of magnitude smaller than the
    historical index, so with ``broadcast_new_ids`` (the contract
    default) the old index is filtered map-side with no shuffle and its
    on-disk partitioning survives untouched. Disable only for a
    backfill-sized "increment", where AQE should pick the strategy."""
    hint = F.broadcast if broadcast_new_ids else (lambda d: d)
    kept = old.join(hint(new_ids.select(id_col).distinct()),
                    id_col, "left_anti")
    return kept.unionByName(new)


def merge_tf_index(
    old_tf: DataFrame,
    new_tf: DataFrame,
    id_col: str = "doc_id",
    max_df: int | None = None,
    broadcast_new_ids: bool = True,
) -> DataFrame:
    """Incremental maintenance of the :func:`build_tf_index` table —
    the index-once/search-many story needs index-once/MERGE-many too: at
    10^10 documents you index the new crawl segment (its own small
    :func:`build_tf_index` pass) and fold it into the persisted index;
    re-tokenizing the historical corpus is never an option.

    Semantics: new wins per document (see :func:`_merge_replacing`) —
    documents only in ``old_tf`` keep their rows, documents in
    ``new_tf`` contribute exactly their new rows, so the result equals
    ``build_tf_index`` over (history minus re-crawled) + new segment.
    (Reference analog: ``main_merge_and_deduplicate.py:42-53`` folds
    each new batch into carried state instead of recomputing from all
    batches; here the carried state is the index itself.)

    ``max_df`` re-applies the ubiquitous-term ceiling on the MERGED
    document frequency (a term under the cap in both halves can exceed
    it merged). Pass it only if both inputs were built UNCAPPED:
    rows a capped build already dropped cannot be recovered here — cap
    at merge/query time for incrementally-maintained indexes (the
    build_tf_index docstring's guard belongs to the one-shot path)."""
    new_ids = new_tf.select(id_col)
    out = _merge_replacing(old_tf, new_tf, new_ids, id_col,
                           broadcast_new_ids)
    if max_df is not None:
        dfreq = out.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
        out = (
            out.join(dfreq.filter(F.col("_df") <= max_df), "token")
            .drop("_df")
        )
    return out.select("token", id_col, "tf")


def merge_doclen(
    old_dl: DataFrame,
    new_dl: DataFrame,
    id_col: str = "doc_id",
    broadcast_new_ids: bool = True,
) -> DataFrame:
    """Incremental merge of the :func:`build_doclen` table — new wins
    per document. The doclen table is one slim row per document, so this
    is the cheap half of an index merge; it must stay in lockstep with
    :func:`merge_tf_index` (N and avgdl come from here)."""
    return _merge_replacing(
        old_dl, new_dl, new_dl.select(id_col), id_col, broadcast_new_ids
    ).select(id_col, "dl")


def merge_positional_postings(
    old_p: DataFrame,
    new_p: DataFrame,
    id_col: str = "doc_id",
    broadcast_new_ids: bool = True,
) -> DataFrame:
    """Incremental merge of :func:`build_positional_postings` — new wins
    per document, same shape as :func:`merge_tf_index` (the position
    lists ride along unchanged; nothing is re-tokenized)."""
    return _merge_replacing(
        old_p, new_p, new_p.select(id_col), id_col, broadcast_new_ids
    ).select("token", id_col, "positions")


def phrase_search_indexed(
    postings: DataFrame,
    phrase: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Phrase retrieval over PREBUILT positional postings
    (:func:`build_positional_postings` output) — identical results to
    :func:`phrase_search` without re-tokenizing the corpus. The token
    filter prunes the postings scan to the phrase's terms BEFORE the
    positions explode."""
    phrase = list(phrase)
    if not phrase:
        raise ValueError("phrase must be non-empty")
    toks = (
        postings.filter(F.col("token").isin(list(set(phrase))))
        .select(
            F.col(id_col),
            F.explode("positions").alias("pos"),
            F.col("token"),
        )
    )
    return _phrase_match(toks, phrase, id_col)


def proximity_search(
    df: DataFrame,
    terms: Sequence[str],
    slop: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ordered proximity retrieval (the slop query between exact phrase
    and bag-of-words AND): documents where ``terms`` occur in order
    with every gap at most ``slop + 1`` token positions (``slop = 0``
    degenerates to the exact phrase). Returns ``(id_col, n_matches)``
    with ``n_matches`` = the number of distinct positions of the LAST
    term reachable through a valid chain — an existential SET fold per
    slot, which is complete (the tempting greedy earliest-next
    advance is not: P1={5,7}, P2={9}, gap 3 — greedy takes 5 and
    strands 9; the set fold keeps both 5 and 7 alive).

    Scale shape: same skeleton as :func:`phrase_search` — the corpus
    token stream is filtered to the queried terms BEFORE any shuffle,
    one groupBy(id, slot) collects per-term position sets, one
    groupBy(id) assembles the slot arrays (ordered by an explicit
    array_sort over (slot, positions) structs — collect_list order is
    not deterministic), and the chain fold is per-row array arithmetic
    bounded by the document's occurrence counts. No self-joins, no
    windows, no Python."""
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token"),
    )
    slots = F.array(*[
        F.struct(F.lit(t).alias("t"), F.lit(i).alias("i"))
        for i, t in enumerate(terms)
    ])
    hits = (
        toks.filter(F.col("token").isin(list(set(terms))))
        .select(id_col, "pos", "token", F.explode(slots).alias("s"))
        .filter(F.col("token") == F.col("s.t"))
        .select(id_col, F.col("s.i").alias("slot"), "pos")
    )
    per_slot = hits.groupBy(id_col, "slot").agg(
        F.array_sort(F.collect_set("pos")).alias("ps"))
    collected = per_slot.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_k"),
        F.array_sort(F.collect_list(F.struct("slot", "ps"))).alias("_sl"),
    )
    P = F.transform(F.col("_sl"), lambda s: s["ps"])
    gap = F.lit(slop + 1)
    reach = F.aggregate(
        F.slice(P, 2, len(terms)),
        F.element_at(P, 1),
        lambda acc, pj: F.filter(
            pj, lambda x: F.exists(acc, lambda c: (x > c) & (x <= c + gap))
        ),
    )
    return (
        collected.filter(F.col("_k") == len(terms))
        .select(F.col(id_col), F.size(reach).alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


def _varint_bytes(v):
    """LEB128 encoded size of a non-negative long — an exact integer
    CASE chain (no float log: log2's ULP at power-of-two boundaries
    is not an engine-parity bet worth making)."""
    return (
        F.when(v < 128, 1)
        .when(v < 16384, 2)
        .when(v < 2097152, 3)
        .when(v < 268435456, 4)
        .otherwise(5)
        .cast("long")
    )


def delta_encode_postings(postings: DataFrame) -> DataFrame:
    """Gap-encode sorted posting lists and cost them as LEB128 varints
    — the measurement half of index compression (Lucene/PISA store
    postings exactly this way: first id absolute, then deltas, small
    gaps = few bytes). Frequent terms have DENSE postings, hence tiny
    gaps, hence the best ratios — the skew that makes raw 8-byte ids
    unaffordable at 10^10 docs is the same skew that compresses best.

    Input is :func:`build_postings` output; returns ``(token, df,
    first_id, gaps, bytes_raw, bytes_delta, ratio)`` with ``bytes_raw
    = 8 * df`` (int64 ids), ``bytes_delta`` the varint cost of first +
    gaps, ``ratio`` 6dp.

    Scale shape: entirely per-row array expressions over the postings
    frame (zip-shift subtraction, an aggregate fold for the byte sum)
    — zero shuffles on top of the index build; whole-stage codegen
    end to end.
    """
    ids = F.col("doc_ids")
    n = F.size(ids)
    gaps = F.zip_with(
        F.slice(ids, 2, F.greatest(n - 1, F.lit(0))),
        F.slice(ids, 1, F.greatest(n - 1, F.lit(0))),
        lambda a, b: a - b,
    )
    first = F.element_at(ids, 1)
    bytes_delta = _varint_bytes(first) + F.aggregate(
        gaps, F.lit(0).cast("long"), lambda acc, g: acc + _varint_bytes(g))
    raw = (F.lit(8) * F.col("df")).cast("long")
    return postings.select(
        "token", "df", first.alias("first_id"), gaps.alias("gaps"),
        raw.alias("bytes_raw"),
        bytes_delta.alias("bytes_delta"),
        F.round(bytes_delta / raw, 6).alias("ratio"),
    )


def retrieval_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Ranked-retrieval evaluation — the harness that closes the search
    family (BM25/phrase/boolean produce rankings; this grades them):
    per query, from a ``(query, doc, rank)`` result list (rank 1-based)
    and a ``(query, doc, rel)`` judgment table (graded relevance,
    0 = irrelevant):

    - ``mrr``        — 1/rank of the first relevant hit (0 if none);
    - ``precision_k`` / ``recall_k`` — relevant-in-top-k over k /
      over total relevant for the query;
    - ``ndcg_k``     — DCG with the log2(rank+1) discount over graded
      rels, normalized by the ideal DCG of the query's judgments
      (TREC convention; 0 when the query has no relevant docs).

    All ratios rounded 6dp. Queries appearing in ``qrels`` but missing
    from ``results`` still report (all-zero rows) — silent query drops
    are exactly what an eval harness must surface.

    Scale shape: one slim equi-join of results to judgments on
    (query, doc), then ONE aggregation per query — map-side partial,
    no windows (ranks arrive from the ranker, which derived them
    bounded); the ideal-DCG side is a second slim aggregation over the
    judgments. Result lists are top-k bounded by construction, so
    per-query state is O(k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = results.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("int").alias("_rank"))
    j = qrels.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("double").alias("_rel"))
    joined = (
        r.join(j, ["_q", "_d"], "left")
        .select("_q", "_rank", F.coalesce("_rel", F.lit(0.0)).alias("_rel"))
    )
    got = joined.groupBy("_q").agg(
        F.max(F.when(F.col("_rel") > 0, 1.0 / F.col("_rank"))
              .otherwise(F.lit(0.0))).alias("_mrr"),
        F.sum(F.when((F.col("_rank") <= k) & (F.col("_rel") > 0), 1)
              .otherwise(0)).alias("_hits_k"),
        F.sum(F.when(F.col("_rank") <= k,
                     (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                     / F.log2(F.col("_rank") + 1.0))
              .otherwise(F.lit(0.0))).alias("_dcg_k"),
    )
    # ideal DCG: judgments sorted by rel desc; position via the graded
    # histogram fold (no window): for each rel grade, its docs occupy
    # the next contiguous rank block
    ideal = (
        j.filter(F.col("_rel") > 0)
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).alias("_n_rel"),
            F.reverse(F.array_sort(F.collect_list("_rel"))).alias("_rels"),
        )
        .select(
            "_q", "_n_rel",
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("_rels"), 1,
                            F.least(F.size("_rels"), F.lit(k))),
                    F.sequence(F.lit(1),
                               F.least(F.size("_rels"), F.lit(k))),
                    lambda rel, pos: (F.pow(F.lit(2.0), rel) - 1.0)
                    / F.log2(pos.cast("double") + 1.0)),
                F.lit(0.0), lambda acc, x: acc + x).alias("_idcg_k"),
        )
    )
    return (
        ideal.join(got, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.round(F.coalesce("_mrr", F.lit(0.0)), 6).alias("mrr"),
            F.round(F.coalesce(F.col("_hits_k"), F.lit(0)) / F.lit(float(k)),
                    6).alias("precision_k"),
            F.round(F.coalesce(F.col("_hits_k"), F.lit(0))
                    / F.col("_n_rel"), 6).alias("recall_k"),
            F.round(
                F.when(F.col("_idcg_k") > 0,
                       F.coalesce("_dcg_k", F.lit(0.0)) / F.col("_idcg_k"))
                .otherwise(F.lit(0.0)), 6).alias("ndcg_k"),
        )
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    rrf_k: int = 60,
    top_k: int = 10,
    id_col: str = "doc_id",
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    — the standard way to combine heterogeneous rankers (lexical BM25 +
    dense embedding top-k is the canonical "hybrid search" pair):
    ``score(d) = sum_i w_i / (rrf_k + rank_i(d))`` over every input
    list that ranked ``d``. Rank-based, so it needs no score
    calibration between rankers whose scales are incomparable (BM25
    sums vs cosines); ``rrf_k`` (60 in the paper) damps the head so a
    single #1 cannot outvote consistent mid-list agreement.

    Inputs are ``(id_col, rank)`` frames — the bounded top-k output
    shape every ranker in this module produces. Determinism: the
    per-document sum folds in input-list order (sorted collect + an
    explicit fold, the ``_bm25_rank`` pattern) so float accumulation
    order is engine-identical; ties break on the id.

    Scale shape: each input is ALREADY top-k bounded by its ranker, so
    the union holds <= sum(k_i) rows per query — fusion cost is
    independent of corpus size. One groupBy on the id, then the
    parallel partial top-k (``orderBy().limit()``) and the window-free
    bounded rank fold. The expensive part of hybrid search is the
    upstream rankers, never the fusion."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError("weights must match rankings length")
    tagged = None
    for i, r in enumerate(rankings):
        w = 1.0 if weights is None else float(weights[i])
        t = r.select(
            F.col(id_col),
            F.lit(i).alias("_src"),
            (F.lit(w) / (F.lit(float(rrf_k))
                         + F.col("rank").cast("double"))).alias("_c"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    folded = (
        tagged.groupBy(id_col)
        .agg(F.array_sort(
            F.collect_list(F.struct("_src", "_c"))).alias("_cs"))
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(F.col("_cs"), F.lit(0.0),
                            lambda acc, x: acc + x["_c"]),
                6).alias("score"),
            F.size("_cs").alias("n_lists"),
        )
    )
    ranked = _rank_bounded(
        folded.orderBy(F.desc("score"), F.asc(id_col)).limit(top_k),
        id_col,
    )
    return ranked.join(folded.select(id_col, "n_lists"), id_col)


def ql_search(
    df: DataFrame,
    terms: Sequence[str],
    mu: float = 1500.0,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR'01) — the language-modeling ranker, BM25's
    principled sibling: ``score(d) = sum_t ln((tf + mu*p_t)/(dl + mu))``
    with ``p_t = cf_t / |C|`` (collection term probability). Documents
    matching at least one query term are scored over ALL query terms
    (absent terms contribute the background probability); query terms
    absent from the whole collection are ignored (p_t = 0 would be
    -inf for every document — the standard OOV drop).

    Computed in the rank-equivalent decomposed form, identically on
    both engines so the 6dp-rounded sum hash-matches:
    ``sum_{t present} ln(1 + tf/(mu*p_t)) + qconst - nq*ln(dl + mu)``
    where ``qconst = sum_t ln(mu*p_t)`` and ``nq`` is the surviving
    query-term count. Both folds run in sorted token order.

    Scale shape: mirrors :func:`bm25_search` — document length is a
    scan-stage ``size(tokens)`` (no explode, no shuffle), the only
    explode is filtered to the query terms BEFORE its shuffle, and the
    collection statistics fall out for free: ``cf_t`` is the sum of
    the per-doc tf rows (already query-term-only), ``|C|`` a 1-row
    aggregate of the doclen column. The query-constant frame is
    |terms| rows -> 1 row, broadcast. Final top-k is the parallel
    partial top-k; ranks come from the window-free bounded fold."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    if mu <= 0:
        raise ValueError(f"mu must be > 0, got {mu}")
    dl = F.coalesce(
        F.size(tokens_col(F.col(text_col))).cast("long"), F.lit(0))
    doclen = df.select(F.col(id_col), dl.alias("_dl"))
    totals = doclen.agg(
        F.sum(F.col("_dl").cast("double")).alias("_ctot"))
    tf = (
        df.select(
            F.col(id_col),
            F.explode(tokens_col(F.col(text_col))).alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tf"))
    )
    cf = tf.groupBy("token").agg(
        F.sum(F.col("_tf").cast("double")).alias("_cf"))
    # query constant: fold ln(mu * cf/|C|) in token order; |terms| rows
    qconst = (
        cf.crossJoin(F.broadcast(totals))
        .select(F.struct(
            "token",
            F.log(F.lit(mu) * F.col("_cf") / F.col("_ctot")).alias("_l"),
        ).alias("_r"))
        .groupBy()
        .agg(F.array_sort(F.collect_list("_r")).alias("_rs"))
        .select(
            F.aggregate(F.col("_rs"), F.lit(0.0),
                        lambda acc, x: acc + x["_l"]).alias("_qc"),
            F.size("_rs").alias("_nq"),
        )
    )
    per_term = (
        tf.join(F.broadcast(cf), "token")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col), F.col("token"),
            F.log(1.0 + F.col("_tf").cast("double")
                  / (F.lit(mu) * F.col("_cf") / F.col("_ctot"))).alias("_s"),
        )
    )
    folded = (
        per_term.groupBy(id_col)
        .agg(F.array_sort(
            F.collect_list(F.struct("token", "_s"))).alias("_ts"))
        .select(
            F.col(id_col),
            F.aggregate(F.col("_ts"), F.lit(0.0),
                        lambda acc, x: acc + x["_s"]).alias("_sp"),
        )
    )
    scored = (
        folded.join(doclen, id_col)
        .crossJoin(F.broadcast(qconst))
        .select(
            F.col(id_col),
            F.round(
                F.col("_sp") + F.col("_qc")
                - F.col("_nq").cast("double")
                * F.log(F.col("_dl").cast("double") + F.lit(mu)),
                6).alias("score"),
        )
    )
    return _rank_bounded(
        scored.orderBy(F.desc("score"), F.asc(id_col)).limit(top_k),
        id_col,
    )


def rm_expansion(
    df: DataFrame,
    terms: Sequence[str],
    mu: float = 1500.0,
    fb_docs: int = 10,
    fb_terms: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback expansion terms — Lavrenko & Croft's
    relevance model (RM1, SIGIR'01), the classic automatic
    query-expansion step (RM3 = interpolate this with the original
    query): take the query-likelihood top ``fb_docs``, weight each by
    its (shift-normalized) query likelihood, and score every term in
    those documents by ``P(t|R) = sum_d P(t|d) * w_d`` with
    ``P(t|d) = tf/dl`` and ``w_d = exp(score_d - max_score) / Z``.
    Returns the top ``fb_terms`` as ``(term, score, rank)``.

    Determinism: document weights use the ALREADY-6dp-rounded QL
    scores; ``Z`` and every per-term sum fold in doc-id order; final
    scores round to 6dp — the whole chain replays exactly in any
    engine.

    Scale shape: the feedback set is ``fb_docs`` rows — everything
    after the QL ranking is bounded. The corpus-scale work is
    :func:`ql_search` itself (audited separately); the feedback docs
    are pulled with one broadcast semi-join on the id, tokenized once
    (fb_docs documents, not the corpus), and the term scoring is a
    fold over <= fb_docs contributions per term."""
    # the QL ranking feeds THREE consumers (max, weights, semi-join);
    # a lazy localCheckpoint materializes the <= fb_docs rows once so
    # the corpus is scanned once, not three times (the zipnum pattern)
    ranked = ql_search(df, terms, mu=mu, top_k=fb_docs,
                       text_col=text_col, id_col=id_col
                       ).transform(_materialize, eager=False)
    # shift-normalized doc weights: 1-row frame (max, Z) with Z folded
    # in doc-id order over <= fb_docs rows
    mx = ranked.agg(F.max("score").alias("_mx"))
    wdoc = (
        ranked.crossJoin(F.broadcast(mx))
        .select(
            F.col(id_col),
            F.exp(F.col("score") - F.col("_mx")).alias("_w"))
    )
    z = (
        wdoc.select(F.struct(F.col(id_col).alias("_id"),
                             F.col("_w").alias("_w")).alias("_r"))
        .groupBy()
        .agg(F.array_sort(F.collect_list("_r")).alias("_rs"))
        .select(F.aggregate(F.col("_rs"), F.lit(0.0),
                            lambda acc, x: acc + x["_w"]).alias("_z"))
    )
    fb = df.join(
        F.broadcast(ranked.select(id_col)), id_col, "semi")
    dl = F.coalesce(
        F.size(tokens_col(F.col(text_col))).cast("long"), F.lit(0))
    doclen = fb.select(F.col(id_col), dl.alias("_dl"))
    tf = (
        fb.select(
            F.col(id_col),
            F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    )
    contrib = (
        tf.join(F.broadcast(doclen), id_col)
        .join(F.broadcast(wdoc), id_col)
        .crossJoin(F.broadcast(z))
        .select(
            "term",
            F.struct(
                F.col(id_col).alias("_id"),
                (F.col("_tf").cast("double")
                 / F.col("_dl").cast("double")
                 * F.col("_w") / F.col("_z")).alias("_c"),
            ).alias("_r"),
        )
    )
    scored = (
        contrib.groupBy("term")
        .agg(F.array_sort(F.collect_list("_r")).alias("_rs"))
        .select(
            "term",
            F.round(
                F.aggregate(F.col("_rs"), F.lit(0.0),
                            lambda acc, x: acc + x["_c"]),
                6).alias("score"),
        )
    )
    return _rank_bounded(
        scored.orderBy(F.desc("score"), F.asc("term")).limit(fb_terms),
        "term",
    )


def kwic_snippets(
    df: DataFrame,
    terms: Sequence[str],
    width: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context snippets — the search-result display step:
    for every document containing at least one query term, a
    ``width``-token window anchored on the FIRST occurrence (the
    grep ``-m1`` convention; window starts ``width // 2`` tokens
    before the hit, clamped to the document start, and clamps short at
    the document end). Returns ``(id_col, first_pos, snippet,
    n_hits)`` with ``first_pos`` the 1-based token position of the
    first hit and ``n_hits`` the query-token count inside the window.

    Scale shape: pure per-row array expressions over the token split
    (bound to a real column so higher-order lambdas read an attribute,
    not a re-evaluated expression — the ``chunk_documents`` lesson);
    zero shuffle, zero Python — composes into the scan stage after any
    retrieval join."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    before = width // 2
    toks = F.col("_toks")
    first0 = F.element_at(
        F.filter(
            F.transform(
                toks, lambda t, i: F.struct(i.alias("_i"), t.alias("_t"))),
            lambda s: s["_t"].isin(terms)),
        1)["_i"]
    base = (
        df.select(F.col(id_col),
                  tokens_col(F.col(text_col)).alias("_toks"))
        .filter(F.exists(toks, lambda t: t.isin(terms)))
        .select(F.col(id_col), toks.alias("_toks"),
                first0.alias("_f0"))
    )
    start0 = F.greatest(F.lit(0), F.col("_f0") - F.lit(before))
    window = F.slice(F.col("_toks"), start0 + 1, width)
    return (
        base.select(F.col(id_col), F.col("_f0"), window.alias("_w"))
        .select(
            F.col(id_col),
            (F.col("_f0") + 1).alias("first_pos"),
            F.concat_ws(" ", F.col("_w")).alias("snippet"),
            F.size(F.filter(
                F.col("_w"), lambda t: t.isin(terms))).alias("n_hits"),
        )
    )


def bm25f_search(
    df: DataFrame,
    terms: Sequence[str],
    field_weights: dict[str, float],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Field-weighted ranked retrieval — BM25F in its simple form
    (Robertson, Zaragoza & Taylor CIKM'04: combine per-field term
    frequencies BEFORE the saturation, never after): per document,
    ``tf~(t,d) = sum_f w_f * tf_f(t,d)`` and
    ``dl~(d) = sum_f w_f * dl_f(d)``, then plain Okapi arithmetic over
    the weighted quantities. This is how web search actually scores —
    a title/anchor hit is worth more than a body hit, and summing
    SCORES per field instead (the naive mistake the paper corrects)
    over-rewards documents matching one term in many fields.

    ``field_weights`` maps text column name -> weight in a FIXED order
    (dict order); the weighted sums fold in that expression order, and
    with exact-binary-fraction weights (the repo's AIMD convention —
    3.0, 1.0, 0.5, ...) every weighted tf/dl is a dyadic rational, so
    sums are exact and engine-replayable regardless of partition order.

    Determinism: weighted tf is a fixed-order expression over per-field
    integer counts (one conditional aggregate per field, never a
    float SUM); the per-document score folds in token order; ranks
    tie-break on the id — the :func:`bm25_search` contract, field-
    weighted.

    Scale shape: identical to :func:`bm25_search` — weighted document
    length is scan-stage (one ``size(tokens)`` per field, no explode);
    the only explode is the per-field token stream filtered to the
    query terms BEFORE its shuffle, and the field dimension folds into
    per-field count columns in the SAME (id, token) aggregate, so the
    field count multiplies map-side work only, not shuffle rows. df
    falls out of the weighted-tf frame (a term counts as present if it
    appears in ANY field). Top-k via orderBy+limit, window-free rank."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    if not field_weights:
        raise ValueError("field_weights must be non-empty")
    for c, w in field_weights.items():
        if w <= 0:
            raise ValueError(f"field weight must be > 0: {c}={w}")
    fields = list(field_weights.items())
    # weighted document length: fixed-order scan-stage expression
    wdl = None
    for col, w in fields:
        term_len = (
            F.coalesce(F.size(tokens_col(F.col(col))).cast("double"),
                       F.lit(0.0)) * F.lit(float(w)))
        wdl = term_len if wdl is None else wdl + term_len
    doclen = df.select(F.col(id_col), wdl.alias("_dl"))
    globals_ = doclen.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl")).alias("_avgdl"),
    )
    # per-field token streams, tagged with the field index, filtered to
    # the query terms before the one shuffle
    stream = None
    for i, (col, _w) in enumerate(fields):
        s = df.select(
            F.col(id_col),
            F.explode(tokens_col(F.col(col))).alias("token"),
            F.lit(i).alias("_fi"),
        )
        stream = s if stream is None else stream.unionByName(s)
    counts = (
        stream.filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(*[
            F.sum(F.when(F.col("_fi") == i, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias(f"_c{i}")
            for i in range(len(fields))
        ])
    )
    wtf = None
    for i, (_col, w) in enumerate(fields):
        term_tf = F.col(f"_c{i}").cast("double") * F.lit(float(w))
        wtf = term_tf if wtf is None else wtf + term_tf
    tf = counts.select(F.col(id_col), F.col("token"), wtf.alias("_tf"))
    return _bm25_rank(tf, doclen, globals_, k1, b, top_k, id_col)


def build_champion_lists(
    tf_index: DataFrame,
    m: int = 128,
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Static index pruning via champion lists (Manning IIR §7.1.3 /
    Carmel et al. SIGIR'01 top-answers pruning): keep, per term, only
    the ``m`` postings with the highest term frequency (ties on the id)
    — the documents that term could ever rank highly. Returns
    ``(token, id, tf, df)`` with ``df`` the term's TRUE pre-pruning
    document frequency, stamped on so idf at query time is computed
    against the full corpus, not the survivors.

    This is the serving-scale lever for stopword-heavy queries: a term
    in 10^10 documents has an 80 GB posting list, but its champion list
    is ``m`` rows — query cost becomes O(|query| * m) regardless of
    corpus size. The price is approximation: a document outside every
    queried term's champion list cannot be retrieved (fine for top-k
    ranking where tf-saturation means low-tf postings hardly score;
    measure with the overlap-vs-full test before deploying).

    Scale shape: per-term top-m via the SALTED two-stage pattern
    (``select_polite_batch``'s exactness argument — any true top-m row
    is in the top-m of its own salt bucket): stage 1 ranks within
    ``(token, salt)`` so a stopword's corpus-sized posting list splits
    across ``salt_buckets`` tasks; stage 2 ranks the <= salt_buckets*m
    survivors per token. Both windows are keyed — no partition-less
    Window. df is a map-side-partial count re-aggregate joined back on
    the token."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    dfreq = tf_index.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"))
    order = [F.col("tf").desc(), F.col(id_col).asc()]
    salted = tf_index.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).cast("int"))
    w1 = Window.partitionBy("token", "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= m)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy("token").orderBy(*order)
    pruned = (
        survivors.withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= m)
        .drop("_rn2")
    )
    return pruned.join(dfreq, "token").select("token", id_col, "tf", "df")


def bm25_search_champion(
    champions: DataFrame,
    doclen: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 over champion lists (:func:`build_champion_lists` output):
    identical arithmetic to :func:`bm25_search_indexed` — idf uses the
    stamped TRUE df, length normalization uses the full ``doclen``
    table — but each queried term contributes at most ``m`` candidate
    rows, so query cost is bounded by the query, not the corpus.
    Documents outside every queried term's champion list are
    unreachable (the documented pruning approximation); any document
    whose every matched posting survived pruning scores EXACTLY as the
    full index would."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    dl = doclen.select(F.col(id_col), F.col("dl").alias("_dl"))
    globals_ = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"),
    )
    tf = champions.filter(F.col("token").isin(terms)).select(
        F.col(id_col), F.col("token"),
        F.col("tf").alias("_tf"), F.col("df").alias("_df"),
    )
    return _bm25_rank(tf, dl, globals_, k1, b, top_k, id_col,
                      df_precomputed=True)


def bm25_search_tombstoned(
    tf_index: DataFrame,
    doclen: DataFrame,
    tombstones: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    stale_stats: bool = False,
) -> DataFrame:
    """:func:`bm25_search_indexed` with DELETES — the index-lifecycle
    step the build/merge/prune family was missing: takedowns and
    post-hoc dedup remove documents from a 10^10-doc index far more
    often than anyone can afford to rewrite posting lists, so deleted
    ids live in a slim ``tombstones`` table and are excluded at QUERY
    time (the Lucene live-docs model; a later merge makes them
    physical). Default is exact statistics: doclen and the tf stream
    are both tombstone-filtered, so N/avgdl/df describe the LIVE
    corpus and scores equal a from-scratch index of the survivors
    (the oracle checks exactly that). ``stale_stats=True`` keeps the
    pre-delete N/avgdl/df (what Lucene actually serves between
    merges — cheaper, scores drift until compaction) while still
    never returning a deleted doc.

    Scale shape: two LEFT ANTI hash joins on the id key against the
    slim tombstone table, on streams already term-filtered — the
    posting lists are never rewritten and the corpus is never
    touched."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    ts = tombstones.select(F.col(id_col)).distinct()
    dl_all = doclen.select(F.col(id_col), F.col("dl").alias("_dl"))
    dl_live = dl_all.join(ts, id_col, "left_anti")
    globals_ = (dl_all if stale_stats else dl_live).agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"),
    )
    tf = (
        tf_index.filter(F.col("token").isin(terms))
        .join(ts, id_col, "left_anti")
        .select(F.col(id_col), F.col("token"), F.col("tf").alias("_tf"))
    )
    if stale_stats:
        # df must stay pre-delete too: recount is meaningless here, so
        # stale mode requires a df column stamped on the index rows
        if "df" not in tf_index.columns:
            raise ValueError(
                "stale_stats=True needs a df column on tf_index "
                "(build-time document frequencies)")
        tf = tf_index.filter(F.col("token").isin(terms)).join(
            ts, id_col, "left_anti").select(
            F.col(id_col), F.col("token"), F.col("tf").alias("_tf"),
            F.col("df").alias("_df"))
        return _bm25_rank(tf, dl_live, globals_, k1, b, top_k, id_col,
                          df_precomputed=True)
    return _bm25_rank(tf, dl_live, globals_, k1, b, top_k, id_col)


# ---------------------------------------------------------------------------
# Block-Max pruning: skip docID regions a query provably cannot rank in
# ---------------------------------------------------------------------------

def build_block_max(
    tf_index: DataFrame,
    doclen: DataFrame,
    block_span: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Block-max metadata ``(token, block_id, n_postings, ub)`` — per
    term, per docID block, the maximum BM25 contribution any posting in
    the block can make (Block-Max WAND, Ding & Suel SIGIR'11).

    Blocks here are fixed docID RANGES (``block_id = id // block_span``)
    rather than the classic fixed-COUNT blocks: range blocks build with
    one groupBy — no per-term sequential numbering, whose window over a
    stopword's corpus-sized posting list is exactly the partition-less-
    shape this module bans — and, because every term uses the SAME
    ranges, block bounds align across query terms, so a whole docID
    region is skippable when the SUM of the terms' block maxima is
    below the threshold (the variable/range-block BMW variant, cf.
    Mallia et al. SIGIR'17). The upper bound is the posting's true
    score — idf from the full df, length norm from the doc's own dl —
    maxed within the block, so the bound is tight per block.

    Scale shape: df re-aggregate + one (token, block) groupBy over the
    index; metadata size = postings / block_span. Build once at index
    time, reuse per query. When ``tf_index`` carries a ``dl`` column
    (``build_tf_index(with_dl=True)``), the postings-sized exchange on
    the id key vanishes — length normalization reads the riding
    column; ``doclen`` then only feeds the 1-row N/avgdl aggregate
    (measured 1.2x on the index-build scaling leg)."""
    dl = doclen.select(F.col(id_col), F.col("dl").alias("_dl"))
    globals_ = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"),
    )
    dfreq = tf_index.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        1.0 + (F.col("_n").cast("double") - F.col("_df") + 0.5)
        / (F.col("_df").cast("double") + 0.5))
    score = idf * (
        F.col("tf").cast("double") * (k1 + 1.0)
        / (F.col("tf").cast("double")
           + k1 * (1.0 - b + b * F.col("_dl").cast("double")
                   / F.col("_avgdl"))))
    scored = tf_index.join(dfreq, "token")
    if "dl" in tf_index.columns:
        scored = scored.withColumn("_dl", F.col("dl"))
    else:
        scored = scored.join(dl, id_col)
    return (
        scored
        .crossJoin(F.broadcast(globals_))
        .select(
            "token",
            (F.col(id_col) / block_span).cast("long").alias("block_id"),
            score.alias("_s"))
        .groupBy("token", "block_id")
        .agg(F.count(F.lit(1)).alias("n_postings"),
             F.max("_s").alias("ub"))
    )


def blockmax_region_plan(
    block_max: DataFrame,
    terms: Sequence[str],
    theta: DataFrame,
    term_caps: DataFrame | None = None,
) -> DataFrame:
    """Per docID region, the query's summed score ceiling and the skip
    verdict: ``(block_id, ub_sum, n_postings, skippable)``.

    A region is skippable iff sum over query terms of the term's block
    maximum < theta: no document in the region can reach theta even
    scoring maximally on every term. With ``theta`` a LOWER bound on
    the true k-th best score (e.g. the k-th score of a champion-list
    search, whose doc scores are <= their full-index scores), skipping
    is LOSSLESS — every true top-k document survives.

    Absent (term, block) rows are AMBIGUOUS: "no postings there"
    (legitimate, ub contribution 0) vs "metadata row missing" (a
    partially-merged prebuilt table — treating it as 0 underestimates
    the ceiling and can skip a block holding a true top-k doc). With
    ``term_caps`` (``(token, cap)``, a metadata-independent per-term
    score bound — BM25 saturates at ``idf*(k1+1)``), absent terms
    contribute their CAP instead of 0, making the verdict sound for
    ANY metadata coverage; without it (None), absence means 0 — only
    valid when the metadata is COMPLETE for the index state (built
    atomically with it, the internal path).

    ``theta`` is a 1-row ``(theta)`` DataFrame so the plan composes
    lazily (no driver collect between champion pass and pruned pass).
    The sum folds in token order over a <=|terms|-element array —
    deterministic, oracle-replayable. Region count = idspace/span:
    metadata-sized groupBy, broadcast theta and caps."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    per_block = (
        block_max.filter(F.col("token").isin(terms))
        .groupBy("block_id")
        .agg(
            F.sum("n_postings").alias("n_postings"),
            F.array_sort(
                F.collect_list(F.struct("token", "ub"))).alias("_tu"))
    )
    ub_present = F.aggregate(F.col("_tu"), F.lit(0.0),
                             lambda acc, x: acc + x["ub"])
    if term_caps is None:
        ub_sum = F.round(ub_present, 6)
    else:
        caps = (
            term_caps.filter(F.col("token").isin(terms))
            .agg(F.array_sort(
                F.collect_list(F.struct("token", "cap")))
                .alias("_caps"))
        )
        per_block = per_block.crossJoin(F.broadcast(caps))
        covered = F.transform(F.col("_tu"), lambda x: x["token"])
        absent_caps = F.aggregate(
            F.filter(F.col("_caps"),
                     lambda c: ~F.array_contains(covered, c["token"])),
            F.lit(0.0), lambda acc, c: acc + c["cap"])
        ub_sum = F.round(ub_present + absent_caps, 6)
    return (
        per_block
        .select("block_id", "n_postings", ub_sum.alias("ub_sum"))
        .crossJoin(F.broadcast(theta))
        .select(
            "block_id", "ub_sum", "n_postings",
            (F.col("ub_sum") < F.col("theta")).alias("skippable"))
    )


def bm25_search_blockmax(
    tf_index: DataFrame,
    doclen: DataFrame,
    terms: Sequence[str],
    champion_m: int = 32,
    block_span: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    block_max: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k that provably equals the full-index ranking while
    reading only the docID regions that can matter — the two pruning
    families composed: a champion-list pass (bounded: m rows per term)
    produces its k-th score as the threshold theta; theta lower-bounds
    the true k-th score, so every region whose summed block maxima
    fall below it is skipped LOSSLESSLY (see blockmax_region_plan);
    the full scorer then runs on the surviving regions only.

    Exactness argument, end to end: (1) champion doc scores are <=
    their full scores, so theta = champion kth <= true kth; (2) a
    skipped region's best possible score < theta <= true kth, so no
    true top-k doc is skipped; (3) survivors are scored by the exact
    :func:`_bm25_rank` arithmetic with the FULL-corpus df stamped
    before pruning. The equality (not similarity) to
    :func:`bm25_search_indexed` is what the driver oracle checks.

    Scale shape: everything bounded or metadata-sized — champion pass
    O(|terms|*m) (built over the query terms' postings only), region
    plan O(idspace/span), final pass excludes skippable regions via a
    broadcast ANTI-join on the computed block id — regions with NO
    metadata row are conservatively kept, so a block_max missing some
    segments' rows (not yet merged) cannot silently drop documents.
    No collect between stages: theta flows as a 1-row broadcast frame.

    Prebuilt-``block_max`` contract: the metadata's ``ub`` values
    embed the index's n/avgdl/df at build time, so a passed
    ``block_max`` must correspond to the SAME ``tf_index``/``doclen``
    state (rebuild it on merge/append, like any other index artifact)
    and the same ``block_span``. MISSING rows — whole blocks or a
    subset of a block's terms (a partially merged segment) — are
    recoverable: absent terms are charged their saturation cap
    ``idf*(k1+1)`` in the skip test and wholly-absent blocks are kept
    by the anti-join, so no coverage gap can drop a true top-k doc;
    stale ``ub`` VALUES (metadata from different corpus stats) are
    not detectable here."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    # the query-term posting slice is the working set of EVERY stage
    # below (champions, df, ad-hoc block maxima, the pruned scorer) —
    # materialize it once: each stage otherwise re-evaluates the whole
    # tf_index subtree independently (zero cross-stage reuse of
    # broadcast builds; measured 12 corpus scans per ad-hoc query).
    # The slice is the postings the full scorer must read anyway — the
    # standard serving materialization — and filtering by token keeps
    # each retained term's posting list COMPLETE, so df, champions and
    # block maxima computed from it are exactly the full-index values.
    tf = tf_index.filter(F.col("token").isin(terms)) \
        .transform(_materialize)
    # champion lists only for the QUERY terms — exact, since each
    # term's full posting list is retained (its top-m and stamped df
    # are unchanged by dropping other terms), and it keeps the theta
    # pass O(|terms|*m) instead of re-pruning the whole index per query
    champs = build_champion_lists(tf, m=champion_m, id_col=id_col)
    ctop = bm25_search_champion(
        champs, doclen, terms, k1=k1, b=b, top_k=top_k, id_col=id_col)
    # theta = the champion k-th score, but ONLY when the champion pass
    # actually filled k slots: with fewer matches the min is not the
    # k-th score and lower-bounds nothing (full search may rank docs
    # the champion lists cannot reach into slots r+1..k), so theta
    # falls back to -inf = nothing skippable, plain full search.
    theta = ctop.agg(
        F.when(F.count(F.lit(1)) >= top_k, F.min("score"))
        .otherwise(F.lit(float("-inf"))).alias("theta"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    dl0 = doclen.select(F.col(id_col), F.col("dl").alias("_dl"))
    globals0 = dl0.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col("_dl").cast("double")).alias("_avgdl"))
    if block_max is not None:
        # prebuilt metadata: its coverage cannot be verified here, so
        # absent (term, block) rows must not read as 0 — give every
        # absent term its metadata-independent saturation cap
        # idf*(k1+1) (tf -> inf limit of the BM25 term score), making
        # the skip verdict sound for ANY partial coverage
        bm = block_max
        caps = (
            dfreq.crossJoin(F.broadcast(globals0))
            .select(
                "token",
                (F.log(1.0 + (F.col("_n").cast("double")
                              - F.col("_df") + 0.5)
                       / (F.col("_df").cast("double") + 0.5))
                 * (k1 + 1.0)).alias("cap")))
    else:
        # metadata built atomically with the index below: complete by
        # construction, absence genuinely means "no postings here".
        # Built from the QUERY-TERM slice (r4): the region plan only
        # reads (query term, block) rows, and the slice carries each
        # retained term's complete posting list, so its per-block
        # maxima and stamped df equal the full-index build's — while
        # the build drops from corpus-token scale to touched-postings
        # scale (and reads the materialized slice, not a fresh scan)
        bm = build_block_max(tf, doclen, block_span=block_span,
                             k1=k1, b=b, id_col=id_col)
        caps = None
    plan = blockmax_region_plan(bm, terms, theta, term_caps=caps)
    # ANTI-join against the SKIPPABLE blocks, not semi against the
    # live ones: a posting whose block is absent from the plan (a
    # stale prebuilt block_max after appends, or a caller block_span
    # mismatch) is conservatively KEPT — absence of metadata must
    # never silently drop documents from a "provably lossless" top-k
    skippable = plan.filter(F.col("skippable")).select("block_id")
    pruned = (
        tf.withColumn(
            "_blk", (F.col(id_col) / block_span).cast("long"))
        .join(F.broadcast(
            skippable.withColumnRenamed("block_id", "_blk")),
            "_blk", "left_anti")
        .join(dfreq, "token")
        .select(F.col(id_col), F.col("token"),
                F.col("tf").alias("_tf"), F.col("_df"))
    )
    return _bm25_rank(pruned, dl0, globals0, k1, b, top_k, id_col,
                      df_precomputed=True)


# ---------------------------------------------------------------------------
# percolation: standing queries matched against incoming documents
# ---------------------------------------------------------------------------

def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "all",
) -> DataFrame:
    """Inverse search (the Elasticsearch percolator / news-alert
    shape): ``queries`` holds STANDING term queries ``(query_id,
    terms array<string>)``; every incoming document is matched against
    all of them — who should be alerted about this page? — yielding
    ``(doc_id, query_id, n_matched, n_terms)`` rows for hits.

    ``mode='all'`` (default) requires every query term in the doc's
    token set (conjunctive alert); ``mode='any'`` fires on one term.

    Scale shape — INVERTED, not broadcast-per-doc: distinct doc tokens
    explode once, equi-join the slim exploded (term, query_id) table,
    then count matched terms per (doc, query) and compare to the
    query's size. Cost is |doc tokens| + |hits|-shaped — a standing
    set of 10^6 alert queries never replicates into every task the
    way a broadcast CNF evaluation would, and a stopword-only query
    cannot force a cartesian (it still equi-joins on the term). The
    per-query term count rides the exploded rows, so queries are
    touched once. No Python, two hash exchanges (tokens, pairs)."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    qt = queries.select(
        "query_id",
        F.size(F.array_distinct("terms")).alias("_nq"),
        F.explode(F.array_distinct("terms")).alias("token"),
    )
    dt = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(tokens_col(F.col(text_col)))).alias("token"),
    )
    hits = (
        dt.join(qt, "token")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("n_matched"),
             F.first("_nq").alias("n_terms"))
    )
    keep = (F.col("n_matched") == F.col("n_terms")) if mode == "all" \
        else (F.col("n_matched") >= 1)
    return hits.filter(keep).select(
        id_col, "query_id", "n_matched", "n_terms")
