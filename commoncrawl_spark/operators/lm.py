"""Corpus-statistics language-model quality scoring (unigram LM).

The CCNet / Gopher-era webtext pipelines score documents with a language
model trained on a trusted corpus and drop the worst-perplexity tail
(reference analog: the notebook's keyword quality gate is the degenerate
hand-written version of this — read_jsonl.ipynb cell 2's frequency
analysis is exactly a unigram fit). A full KenLM is out of scope for a
pure-Spark engine, but the unigram LM — token log-probabilities from
corpus frequencies — is the same pipeline shape and is exactly
expressible in Catalyst, so it serves both as a usable quality signal
and as the slot where a KenLM/ngram scorer would plug in.

Scale shapes (no Python anywhere):

- ``unigram_counts``: explode + groupBy(token) — ONE shuffle whose rows
  are (token, count) after map-side partial aggregation; the fat text
  column never moves.
- ``unigram_logprob_scores``: explode + join(counts) + groupBy(doc) —
  the join key is the token column; AQE broadcasts the counts side when
  the vocabulary is small (real-language vocabularies are ~10^6 rows =
  a few MB — essentially always broadcast), so the only exchange left
  is the per-document re-aggregation. Totals (corpus size / vocabulary)
  ride along as a 1-row crossJoin — no driver collect, the plan stays
  lazy end to end.

Determinism: scores are rounded to 6 decimals (the cross-engine compare
precision); the summation is a float add over per-token logs whose
error is ~1e-13 relative, far below the rounding grain.

Caching note (r03, amended r04): no CORPUS-scale frame is ever
persisted or cached — the per-document term-frequency table stays a
recomputed subtree (train + score means it evaluates twice — a
deliberate trade: two scan-stage tokenize passes, which parallelize
perfectly, instead of caching a corpus-token-scale frame into LRU
churn at 100 TB). The one exception added in r04 is MODEL-table-sized
and gate-proven: when a bigram model table is about to broadcast,
``_gate_model`` materializes it through the package seam
(``materialize`` — reliable ``checkpoint`` when a checkpoint dir is
configured, ``localCheckpoint`` in the sandbox; bounded blocks,
lineage truncated) because otherwise the expensive training
aggregation re-evaluates once per derived-table broadcast build —
measured 4-5x in kneser_ney. Retention: the blocks live while the
returned scorer/model frame is reachable; see ``_gate_model``'s
lifecycle paragraph. Scoring reconstructs the
occurrence stream from the tf table (``array_repeat`` by the per-doc
count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analytics import tokens_col
from ..materialize import materialize as _materialize

# Auto-broadcast row ceiling for LM model tables. Spark hard-refuses
# broadcasts past 8 GiB / 512M rows; a slim (w1, w2, cnt) unsafe row is
# ~60-80 bytes, so 16M rows is ~1-1.25 GiB — large but safe on the
# executor sizes this engine targets, and far under the hard ceiling.
# The bound matters for the BIGRAM scorers: Heaps' law bounds token
# TYPES (~10^7 at any corpus size) but NOT pair types — at the
# 10^13-token design point bigram types are ~10^10 rows, which would
# kill an unconditional broadcast outright. The auto gate probes the
# model table's cardinality and refuses the hint above this bound,
# leaving the join to AQE instead of dying at scale.
BROADCAST_ROW_LIMIT = 16_000_000


def _gate_model(counts, broadcast_counts, row_limit,
                source=None, text_col=None):
    """Tri-state broadcast gate for LM model tables. Returns
    ``(counts, hint)`` — the possibly-materialized model table and the
    resolved broadcast decision; callers derive the secondary tables
    (context totals, continuation counts — aggregates OF ``counts``,
    so ``|counts|`` bounds them all) from the RETURNED frame and apply
    ``F.broadcast`` to each iff ``hint``.

    ``broadcast_counts=None`` (auto) proves the model table is at most
    ``row_limit`` rows before hinting; ``True`` forces the hint
    (caller knows the model is small — e.g. an external trusted-corpus
    model); ``False`` never hints (AQE may still convert at runtime
    from actual shuffle sizes). The hint is physical only — results
    are identical in all three modes.

    Auto probes in two tiers. Tier 1 (self-trained models only, when
    ``source``/``text_col`` are given): distinct pairs <= pair
    instances <= total text bytes / 2 (tokens are >=1 char and
    >=1-char separated), one scan-stage sum of ``octet_length`` — no
    tokenize, no shuffle — which settles every corpus whose TEXT is
    smaller than ~2x the row limit. "No shuffle" is not "no cost": the
    probe is a FULL SCAN of the corpus text column, and it runs
    EAGERLY at scorer construction — at the 100 TB design point that
    is a real extra corpus pass (cheap relative to the tokenize passes
    scoring itself pays, but a pass), and construction now blocks on —
    and can fail on — source availability before any action is
    requested. Callers who cannot afford either pass the decision
    themselves (``broadcast_counts=True/False``), which skips every
    probe. Tier 2: an exact count() of the model table — one extra
    pass over its subtree; trivially cheap against an external model,
    and self-trained it is the price of not OOMing the cluster at the
    design scale.

    Materialization & lifecycle: when the decision is to broadcast,
    the model table is materialized first via the package seam
    (``materialize`` — reliable ``checkpoint`` under a configured
    checkpoint dir, else ``localCheckpoint``; eager, so construction
    triggers the training job). The gate just proved it bounded, and
    WITHOUT this the corpus-scale aggregation beneath it re-evaluates
    for every derived table's broadcast build (measured: kneser_ney
    ran the pair aggregation 4-5x — its plan held five copies of the
    upstream exchange with zero reuse). The materialized blocks live
    as long as the RETURNED frame is reachable: the scorer closure
    holds it, so each scorer pins one model-table-sized block set
    (bounded by ``row_limit`` rows by construction). Long-lived
    sessions that build many scorers should drop scorer references
    when done — Spark's ContextCleaner frees the blocks after Python
    GC (``spark.cleaner.referenceTracking``, on by default; local
    checkpoints add ``...cleanCheckpoints=true`` for the reliable
    mode). There is deliberately no unpersist hook: the frame itself
    IS the handle, and releasing it is dropping it. Unbroadcast
    (huge) models are never materialized.
    """
    if broadcast_counts is None:
        if source is not None and text_col is not None:
            bound = source.agg(F.sum(
                (F.octet_length(F.col(text_col)) + F.lit(1)) / 2
            )).first()[0] or 0
            broadcast_counts = bound <= row_limit or None
        if broadcast_counts is None:
            broadcast_counts = counts.count() <= row_limit
    if broadcast_counts:
        counts = counts.transform(_materialize)
    return counts, bool(broadcast_counts)


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: corpus token frequencies ``(token, cnt)``. One explode +
    one hash exchange on the token (map-side partial count)."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_logprob_scores(
    df: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.0,
    broadcast_counts: bool = True,
) -> DataFrame:
    """Score: per document, the mean natural-log unigram probability of
    its tokens under ``counts`` (default: self-trained on ``df`` — the
    exact MLE, every token in-vocabulary). Output one row per document:
    ``(id_col, n_tokens, avg_logprob)`` — higher is more typical;
    ``exp(-avg_logprob)`` is the perplexity. Empty documents score null.

    ``alpha`` > 0 applies Laplace smoothing ``(cnt + alpha) /
    (total + alpha * vocab)`` so out-of-vocabulary tokens (external
    ``counts``) get finite mass; with the default self-trained counts
    alpha=0 is exact (no token can be OOV). Scoring against EXTERNAL
    counts with alpha=0 yields a NULL score for any document containing
    an OOV token — log(0) has no finite value, and silently averaging
    only the in-vocabulary tokens would rank gibberish HIGH; pick
    alpha > 0 to score such documents finitely instead.
    """
    # one tokenization pass: per-doc term frequencies are the shared
    # intermediate — corpus counts derive FROM them (sum), and the
    # occurrence stream for the per-doc mean reconstructs via
    # array_repeat, so no second explode and no persist (module note)
    # explode_outer keeps empty/null-text documents as one null-token
    # sentinel row, so they flow through the per-doc aggregate and the
    # output is one-row-per-input-document WITHOUT a corpus-scale
    # restore join back onto df (the join was a doc_id SortMergeJoin —
    # an extra shuffle of both sides and a second scan of df)
    tf = (
        df.select(
            F.col(id_col),
            F.explode_outer(tokens_col(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tfd"))
    )
    if counts is None:
        counts = (
            tf.where(F.col("token").isNotNull())
            .groupBy("token").agg(F.sum("_tfd").alias("cnt"))
        )
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_vocab"),
    )
    if broadcast_counts:
        # explicit: AQE's runtime SMJ->BHJ conversion happens only
        # after BOTH join children's shuffle stages materialize, so the
        # corpus-scale tf stream would still write token-keyed shuffle
        # files (stopword-skewed) before the plan improves; vocabulary
        # is Heaps-law bounded (token types, not instances), so the
        # hint holds far past this corpus — disable for pathological
        # vocabularies and let AQE decide
        counts = F.broadcast(counts)
    p_num = F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha)
    p_den = F.col("_total").cast("double") + F.lit(alpha) * F.col("_vocab")
    # the null-token sentinel repeats 0 times -> explode_outer emits a
    # single null struct, which count("_o")/avg skip, so empty docs
    # score (0, null) with no restore join
    occ = (
        tf.join(counts, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.explode_outer(F.array_repeat(
                F.struct(
                    F.log(p_num / p_den).alias("_lp"),
                    F.col("cnt").isNull().alias("_oov"),
                ),
                F.when(F.col("token").isNull(), F.lit(0))
                .otherwise(F.col("_tfd").cast("int")))).alias("_o"),
        )
    )
    return (
        occ.groupBy(id_col)
        .agg(
            F.count("_o").alias("n_tokens"),
            F.round(F.avg("_o._lp"), 6).alias("_avg"),
            F.coalesce(
                F.sum(F.col("_o._oov").cast("long")), F.lit(0)
            ).alias("_n_oov"),
        )
        .select(
            id_col,
            F.col("n_tokens"),
            F.when((F.lit(float(alpha)) == 0.0) & (F.col("_n_oov") > 0),
                   F.lit(None).cast("double"))
            .otherwise(F.col("_avg")).alias("avg_logprob"),
        )
    )


def _bigrams_col(text):
    """array<struct<w1,w2>> of consecutive token pairs (empty under two
    tokens). Per-row array expression — no shuffle.

    Shape note: zip_with over the array and its shifted self, NOT
    ``transform(sequence(1, n-1), i -> element_at(toks, i))`` — a
    non-lambda-bound subexpression inside a higher-order-function lambda
    is re-evaluated PER ELEMENT (codegen does not hoist it), so the
    element_at form re-runs the regex tokenizer n times per row =
    O(n^2) per document (measured 28x slower at ~700 tokens/doc). The
    two slices evaluate the tokenizer a constant number of times."""
    toks = tokens_col(text)
    n = F.size(toks)
    k = F.greatest(n - 1, F.lit(0))
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, k),
            F.slice(toks, 2, k),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: corpus bigram frequencies ``(w1, w2, cnt)``. One explode +
    one hash exchange on the pair (map-side partial count)."""
    return (
        df.select(F.explode(_bigrams_col(F.col(text_col))).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bigram_logprob_scores(
    df: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_counts: bool | None = None,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
) -> DataFrame:
    """Conditional bigram scoring — one order up from the unigram MLE
    toward the KenLM slot: per document, the mean ``ln p(w2 | w1)``
    over its consecutive token pairs, with ``p(w2 | w1) = c(w1, w2) /
    c(w1, ·)`` (the left-context total, derived from the bigram table
    itself so the estimate is self-consistent). Output one row per
    document: ``(id_col, n_bigrams, avg_logprob)``; documents under two
    tokens score null.

    Scale shape: counts shuffle carries (w1, w2, count) — tokens, never
    text; the context table is a second tiny aggregate of the counts;
    the scoring joins broadcast both model tables when the model is
    provably small (``broadcast_counts=None`` auto-probes cardinality
    against ``broadcast_row_limit`` — bigram TYPES are NOT Heaps-
    bounded, ~10^10 at the 10^13-token design point, so an
    unconditional hint would die there), so at moderate model sizes
    the per-doc pair stream is never shuffled on pair keys, and at
    extreme ones the join degrades to AQE instead of a broadcast OOM.
    Self-trained (default
    counts) means every document bigram is in-table — no OOV path.
    Against EXTERNAL counts, a document containing any out-of-table
    bigram scores NULL (there is no smoothing on this path, and
    averaging only the in-table pairs would rank unseen text high);
    n_bigrams always counts the document's actual pairs."""
    # same single-pass shape as the unigram scorer: per-doc pair
    # frequencies are the shared intermediate (train = sum over them,
    # score = array_repeat reconstruction) — no persist (module note)
    # explode_outer keeps under-two-token documents as one null-pair
    # sentinel row (same no-restore-join shape as the unigram scorer)
    tfb = (
        df.select(F.col(id_col),
                  F.explode_outer(_bigrams_col(F.col(text_col))).alias("bg"))
        .select(id_col, "bg.w1", "bg.w2")
        .groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_tfd"))
    )
    self_trained = counts is None
    if counts is None:
        counts = (
            tfb.where(F.col("w1").isNotNull())
            .groupBy("w1", "w2").agg(F.sum("_tfd").alias("cnt"))
        )
    # size-gated broadcast (r4): without the hint the corpus-scale
    # per-doc pair stream writes (w1, w2)-keyed shuffle files before
    # AQE converts the join, but an unconditional hint dies when the
    # bigram-type table outgrows the broadcast ceiling — probe first;
    # ctx derives from the RETURNED (materialized) model table so the
    # training aggregation runs once, not once per broadcast build
    counts, _hint = _gate_model(
        counts, broadcast_counts, broadcast_row_limit,
        source=df if self_trained else None, text_col=text_col)
    ctx = counts.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    if _hint:
        counts, ctx = F.broadcast(counts), F.broadcast(ctx)
    lp = F.log(F.col("cnt").cast("double") / F.col("ctx").cast("double"))
    occ = (
        tfb.join(counts, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .select(
            F.col(id_col),
            F.explode_outer(F.array_repeat(
                F.struct(
                    lp.alias("_lp"),
                    F.col("cnt").isNull().alias("_oov"),
                ),
                F.when(F.col("w1").isNull(), F.lit(0))
                .otherwise(F.col("_tfd").cast("int")))).alias("_o"),
        )
    )
    return (
        occ.groupBy(id_col)
        .agg(
            F.count("_o").alias("n_bigrams"),
            F.round(F.avg("_o._lp"), 6).alias("_avg"),
            F.coalesce(
                F.sum(F.col("_o._oov").cast("long")), F.lit(0)
            ).alias("_n_oov"),
        )
        .select(
            id_col,
            F.col("n_bigrams"),
            F.when(F.col("_n_oov") > 0, F.lit(None).cast("double"))
            .otherwise(F.col("_avg")).alias("avg_logprob"),
        )
    )

def stupid_backoff_scores(
    df: DataFrame,
    counts: DataFrame | None = None,
    unigrams: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    broadcast_counts: bool | None = None,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
) -> DataFrame:
    """Stupid Backoff bigram scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation"): per consecutive pair,
    ``S(w2|w1) = c(w1,w2) / c(w1,.)`` when the bigram is in-table, else
    back off to ``alpha * c(w2) / N`` (corpus unigram frequency, the
    paper's alpha = 0.4). Output one row per document: ``(id_col,
    n_bigrams, avg_logscore)`` — the mean ``ln S`` over the document's
    pairs (S is a score, not a normalized probability — the paper's
    point is that at web scale backoff weights need no normalization).

    This is the operator that closes ``bigram_logprob_scores``'s
    external-counts gap: a model trained on segment A scores segment B
    FINITELY on unseen bigrams instead of NULL — the cross-segment
    quality-scoring shape (train on trusted corpus, score the crawl)
    that CCNet runs with KenLM. A document scores NULL only when some
    token is outside even the UNIGRAM table (true OOV); n_bigrams
    always counts the document's actual pairs.

    ``counts`` / ``unigrams`` default to self-training on ``df``
    (then no pair can be OOV and the result equals
    ``bigram_logprob_scores``). Pass both together when scoring against
    an external model (``bigram_counts(train)`` / ``unigram_counts
    (train)``).

    Scale shape: identical to ``bigram_logprob_scores`` — the corpus
    pair stream aggregates per (doc, pair) once, and the three model
    tables (bigram, left-context, unigram+total) broadcast under the
    same size gate (``broadcast_counts=None`` auto-probes the bigram
    table's cardinality — it bounds the other two), so nothing
    corpus-scale shuffles on a token key at moderate model sizes and
    nothing OOMs at extreme ones. Empty / single-token documents
    survive as explode_outer sentinel rows (no restore join).
    """
    if (counts is None) != (unigrams is None):
        # half a model silently self-trains the other half on the
        # corpus being SCORED: every token becomes in-vocabulary (no
        # true-OOV NULL ever fires) and unseen bigrams back off to the
        # scored corpus's frequencies instead of the trusted model's —
        # plausible-looking but wrong scores, so refuse loudly
        raise ValueError(
            "stupid_backoff_scores: pass counts and unigrams TOGETHER "
            "(both from the same training corpus) or neither "
            "(self-train); got exactly one")
    tfb = (
        df.select(F.col(id_col),
                  F.explode_outer(_bigrams_col(F.col(text_col))).alias("bg"))
        .select(id_col, "bg.w1", "bg.w2")
        .groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_tfd"))
    )
    self_trained = counts is None
    if counts is None:
        counts = (
            tfb.where(F.col("w1").isNotNull())
            .groupBy("w1", "w2").agg(F.sum("_tfd").alias("cnt"))
        )
    if unigrams is None:
        unigrams = unigram_counts(df, text_col=text_col)
    counts, _hint = _gate_model(
        counts, broadcast_counts, broadcast_row_limit,
        source=df if self_trained else None, text_col=text_col)
    ctx = counts.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    uni = unigrams.select(F.col("token").alias("w2"),
                          F.col("cnt").alias("_ucnt"))
    totals = uni.agg(F.sum("_ucnt").alias("_n"))
    if _hint:
        counts, ctx = F.broadcast(counts), F.broadcast(ctx)
    if self_trained:
        # self-trained unigram table = token TYPES of the scored corpus
        # — genuinely Heaps-bounded, hint unless explicitly disabled
        if broadcast_counts is not False:
            uni = F.broadcast(uni)
    else:
        # EXTERNAL unigram table (the both-or-neither guard above means
        # external counts => external unigrams): its size is the
        # caller's choice, not Heaps-bounded by df — gate it on its own
        # cardinality (cheap: the table is precomputed)
        uni, _uhint = _gate_model(
            uni, broadcast_counts, broadcast_row_limit)
        if _uhint:
            uni = F.broadcast(uni)
    seen = F.col("cnt").isNotNull()
    score = F.when(
        seen, F.col("cnt").cast("double") / F.col("ctx").cast("double")
    ).otherwise(
        F.lit(float(alpha)) * F.col("_ucnt").cast("double")
        / F.col("_n").cast("double")
    )
    occ = (
        tfb.join(counts, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.explode_outer(F.array_repeat(
                F.struct(
                    F.log(score).alias("_lp"),
                    (~seen & F.col("_ucnt").isNull()).alias("_oov"),
                ),
                F.when(F.col("w1").isNull(), F.lit(0))
                .otherwise(F.col("_tfd").cast("int")))).alias("_o"),
        )
    )
    return (
        occ.groupBy(id_col)
        .agg(
            F.count("_o").alias("n_bigrams"),
            F.round(F.avg("_o._lp"), 6).alias("_avg"),
            F.coalesce(
                F.sum(F.col("_o._oov").cast("long")), F.lit(0)
            ).alias("_n_oov"),
        )
        .select(
            id_col,
            F.col("n_bigrams"),
            F.when(F.col("_n_oov") > 0, F.lit(None).cast("double"))
            .otherwise(F.col("_avg")).alias("avg_logscore"),
        )
    )


def kneser_ney_scores(
    df: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_counts: bool | None = None,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the standard n-gram
    smoothing (what KenLM implements) and the real upgrade over the MLE
    and stupid-backoff scorers: per document, the mean
    ``ln P_KN(w2 | w1)`` with

        P_KN(w2|w1) = max(c(w1,w2) - d, 0) / c(w1,.)
                      + (d * N1+(w1,.) / c(w1,.)) * (N1+(.,w2) / T)

    where ``N1+(w1,.)`` counts distinct continuations of w1,
    ``N1+(.,w2)`` counts distinct left contexts of w2 (the continuation
    probability — "how promiscuously does w2 follow things" — the KN
    insight that fixes 'San Francisco' inflating P(Francisco)), and
    ``T`` is the number of distinct bigram types. Output one row per
    document: ``(id_col, n_bigrams, avg_logprob)``; under-two-token
    documents score null ``avg_logprob`` with ``n_bigrams = 0``.

    Self-trained (default counts) every pair is in-table and every
    component is positive, so no OOV path; against EXTERNAL counts any
    out-of-table pair (unseen bigram OR unseen continuation) nulls the
    document, matching :func:`bigram_logprob_scores`' contract.

    Scale shape: identical to the other scorers — the shared per-doc
    pair-frequency table is the only corpus-size shuffle (slim token
    keys, map-side partial); the four model tables (counts, context
    totals+fanouts, continuation counts, the 1-row type total)
    broadcast under the size gate (``broadcast_counts=None``
    auto-probes the bigram table — it bounds the derived tables);
    scoring re-aggregates on the doc key. No persist, no windows, no
    Python."""
    d = float(discount)
    if not 0.0 < d < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    tfb = (
        df.select(F.col(id_col),
                  F.explode_outer(_bigrams_col(F.col(text_col))).alias("bg"))
        .select(id_col, "bg.w1", "bg.w2")
        .groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_tfd"))
    )
    self_trained = counts is None
    if counts is None:
        counts = (
            tfb.where(F.col("w1").isNotNull())
            .groupBy("w1", "w2").agg(F.sum("_tfd").alias("cnt"))
        )
    counts, _hint = _gate_model(
        counts, broadcast_counts, broadcast_row_limit,
        source=df if self_trained else None, text_col=text_col)
    ctx = counts.groupBy("w1").agg(
        F.sum("cnt").alias("ctx"),
        F.count(F.lit(1)).alias("n_follow"),
    )
    cont = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n_precede"))
    types = counts.agg(F.count(F.lit(1)).alias("_types"))
    if _hint:
        counts, ctx, cont = (F.broadcast(counts), F.broadcast(ctx),
                             F.broadcast(cont))
    # operand-for-operand the formula above — the DuckDB oracle replays
    # this exact arithmetic so the 6dp round is bit-stable cross-engine
    p = (
        F.greatest(F.col("cnt").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("ctx").cast("double")
        + (F.lit(d) * F.col("n_follow").cast("double")
           / F.col("ctx").cast("double"))
        * (F.col("n_precede").cast("double")
           / F.col("_types").cast("double"))
    )
    occ = (
        tfb.join(counts, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(types))
        .select(
            F.col(id_col),
            F.explode_outer(F.array_repeat(
                F.struct(
                    F.log(p).alias("_lp"),
                    (F.col("cnt").isNull()
                     | F.col("n_precede").isNull()).alias("_oov"),
                ),
                F.when(F.col("w1").isNull(), F.lit(0))
                .otherwise(F.col("_tfd").cast("int")))).alias("_o"),
        )
    )
    return (
        occ.groupBy(id_col)
        .agg(
            F.count("_o").alias("n_bigrams"),
            F.round(F.avg("_o._lp"), 6).alias("_avg"),
            F.coalesce(
                F.sum(F.col("_o._oov").cast("long")), F.lit(0)
            ).alias("_n_oov"),
        )
        .select(
            id_col,
            F.col("n_bigrams"),
            F.when(F.col("_n_oov") > 0, F.lit(None).cast("double"))
            .otherwise(F.col("_avg")).alias("avg_logprob"),
        )
    )
