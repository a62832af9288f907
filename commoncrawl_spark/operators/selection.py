"""Training-data selection and mixing: importance-weighted domain
selection (DSIR-shaped) and deterministic token-budget sampling.

The reference's notebooks stop at keyword gates (read_jsonl.ipynb cell
2); the pretraining pipelines this engine targets select data with
corpus-statistics importance weights (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling" — hashed-n-gram
unigram-LM log-ratio between a target corpus and the raw pool) and then
mix sources to per-domain token budgets (the Pile / Dolma mixture
recipes publish exactly such budgets).

Scale shapes (no Python anywhere):

- ``dsir_logratio_scores``: both model tables are vocabularies (token
  TYPES — Heaps-law bounded), merged with one full-outer join and
  broadcast; the raw pool streams through one tokenize + per-(doc,
  token) aggregate and one per-doc aggregate. Nothing corpus-scale
  shuffles on a token key.
- ``sample_token_budget``: per-group token totals are one map-side
  partial aggregate (groups ~ sources/languages, i.e. tiny); keep
  fractions broadcast back onto the scan; membership is a pure
  per-row hash predicate — the sample is reproducible across re-runs,
  repartitions, executors, and engines (same md5-bucket family as
  ``split_train_val_test`` / shard assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analytics import tokens_col
from .lm import unigram_counts
from ..functions.text import token_count_col

_U32 = 4294967296.0  # 2^32: md5-prefix bucket -> uniform [0, 1)


def _md5_u32(id_col: str, salt: str):
    """First 8 md5 hex chars of ``(id, salt)`` as a double in
    [0, 2^32) — the engine-reproducible uniform draw every sampler in
    this module derives from (divide by ``_U32`` for [0,1); add 0.5
    first to keep ``ln`` off exact zero). One definition so the
    cross-engine hash-width/salt convention cannot silently diverge
    between operators (each DuckDB oracle replays this expression)."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
            1, 8), 16, 10)
        .cast("long").cast("double")
    )


def dsir_logratio_scores(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document importance weight for target-domain selection: the
    mean over the document's tokens of ``ln(p_target(w) / p_raw(w))``,
    where both are Laplace-smoothed unigram LMs — ``p(w) = (c(w) +
    alpha) / (N + alpha * V)`` with ``V`` the JOINT vocabulary (union
    of both corpora's token types), so every token has finite mass on
    both sides and no document scores NULL for vocabulary reasons.

    Output one row per input document: ``(id_col, n_tokens,
    avg_logratio)`` — higher = more target-like; DSIR resamples the
    pool with probability proportional to the exponentiated weight,
    which preserves target-distribution coverage where a hard
    classifier threshold collapses it. Empty documents score
    ``(0, NULL)``.

    The sum runs over per-(doc, token) term frequencies (``sum(tf *
    lr) / sum(tf)``), not a re-exploded occurrence stream — the
    log-ratio is constant per token type, so weighting by tf is exact
    and skips the array_repeat reconstruction the LM scorers need for
    their occurrence means.
    """
    ct = unigram_counts(target, text_col=text_col).withColumnRenamed(
        "cnt", "_ct")
    cb = unigram_counts(df, text_col=text_col).withColumnRenamed(
        "cnt", "_cb")
    # one vocab-sized full-outer merge; totals + joint-vocab size ride
    # along as a 1-row broadcast (no driver collect, plan stays lazy)
    vocab = ct.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce(F.col("_ct"), F.lit(0)).alias("_ct"),
        F.coalesce(F.col("_cb"), F.lit(0)).alias("_cb"),
    )
    totals = vocab.agg(
        F.sum("_ct").alias("_nt"),
        F.sum("_cb").alias("_nb"),
        F.count(F.lit(1)).alias("_v"),
    )
    a = F.lit(float(alpha))
    p_t = (F.col("_ct").cast("double") + a) \
        / (F.col("_nt").cast("double") + a * F.col("_v"))
    p_b = (F.col("_cb").cast("double") + a) \
        / (F.col("_nb").cast("double") + a * F.col("_v"))
    tf = (
        df.select(
            F.col(id_col),
            F.explode_outer(tokens_col(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tf"))
    )
    real = F.col("token").isNotNull()
    scored = (
        tf.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.when(real, F.col("_tf")).otherwise(F.lit(0)).alias("_n"),
            F.when(real, F.col("_tf").cast("double") * F.log(p_t / p_b))
            .otherwise(F.lit(0.0)).alias("_lr"),
        )
        .groupBy(id_col)
        .agg(F.sum("_n").alias("n_tokens"), F.sum("_lr").alias("_sum"))
    )
    return scored.select(
        id_col,
        F.col("n_tokens"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("_sum") / F.col("n_tokens"), 6))
        .otherwise(F.lit(None).cast("double")).alias("avg_logratio"),
    )


def sample_token_budget(
    df: DataFrame,
    budgets: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic mixture sampling: downsample each group (source /
    language / domain) so its EXPECTED token count meets its budget —
    the Pile/Dolma-style mixing step that turns "we have 40T tokens of
    web and 0.3T of books" into a training mix.

    ``budgets`` is a tiny DataFrame ``(group_col, budget_tokens)``;
    groups absent from it are dropped (budget 0). Each group keeps a
    document iff its md5-uniform draw falls under ``keep_frac =
    min(1, budget_tokens / group_tokens)`` — membership is a pure
    function of (id, salt), so the sample is identical across re-runs,
    partitionings, and engines; ``salt`` re-draws without re-ordering.
    Sampling is per-document (documents are exchangeable within a
    group), so the realized token count concentrates on the budget at
    corpus scale rather than matching it exactly — cutting documents
    to hit budgets exactly would bias against long documents.

    Output: the kept rows as ``(id_col, group_col, n_tokens,
    keep_frac)`` — ``keep_frac`` doubles as the importance weight
    (1/keep_frac reweights aggregates back to the full corpus).

    Scale shape: one map-side-partial aggregate to per-group token
    totals (group cardinality ~ tens), fractions broadcast onto the
    scan, then a per-row hash filter — the text column never shuffles
    and the filter runs in the scan stage.
    """
    with_n = df.select(
        F.col(id_col), F.col(group_col),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    group_tokens = with_n.groupBy(group_col).agg(
        F.sum("n_tokens").alias("_group_tokens"))
    frac = (
        group_tokens.join(budgets, group_col)
        .select(
            group_col,
            F.least(
                F.lit(1.0),
                F.col("budget_tokens").cast("double")
                / F.col("_group_tokens").cast("double"),
            ).alias("keep_frac"),
        )
    )
    u01 = _md5_u32(id_col, salt) / F.lit(_U32)
    return (
        with_n.join(F.broadcast(frac), group_col)
        .where(u01 < F.col("keep_frac"))
        .select(id_col, group_col, "n_tokens", "keep_frac")
    )


def temperature_budgets(
    df: DataFrame,
    alpha: float = 0.5,
    total_budget: int = 1_000_000,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture budgets (the mT5 / XLM-R sampling
    rule, Xue et al. 2021): allocate a total token budget across
    groups proportionally to ``share^alpha`` — ``alpha=1`` keeps the
    corpus proportions, ``alpha -> 0`` flattens toward uniform, the
    published sweet spots (0.3-0.7) boost low-resource languages
    without drowning the head. The output ``(group_col,
    budget_tokens)`` table plugs directly into
    :func:`sample_token_budget`, which turns budgets into a
    deterministic per-document keep rule.

    Scale shape: ONE map-side-partial aggregate to per-group token
    totals (group cardinality ~ tens), the powered masses summed on a
    1-row broadcast, one row out per group. The powered mass is
    rounded to 6dp before normalization so both engines (and any
    libm's last-ulp ``pow`` difference) compute the same shares.
    """
    group_tokens = (
        df.select(F.col(group_col),
                  token_count_col(F.col(text_col)).alias("_n"))
        .groupBy(group_col).agg(F.sum("_n").alias("_group_tokens"))
    )
    powered = group_tokens.select(
        group_col,
        F.round(F.pow(F.col("_group_tokens").cast("double"),
                      F.lit(float(alpha))), 6).alias("_mass"),
    )
    total = powered.agg(F.sum("_mass").alias("_total_mass"))
    return (
        powered.join(F.broadcast(total))
        .select(
            group_col,
            F.floor(F.lit(int(total_budget)) * F.col("_mass")
                    / F.col("_total_mass")).cast("long")
            .alias("budget_tokens"),
        )
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``k`` rows —
    Efraimidis & Spirakis (IPL 2006): draw ``u ~ U(0,1)`` per row, keep
    the ``k`` largest ``u^(1/w)``. Each row's inclusion probability is
    proportional to its weight, sequentially without replacement — the
    RESAMPLING step data-selection pipelines run on importance weights
    (feed ``exp(avg_logratio)`` from :func:`dsir_logratio_scores`, or
    token counts to sample documents proportional to their token
    mass). Unlike :func:`sample_token_budget` (Bernoulli, expected-size
    per group) this returns an EXACT sample size with per-row
    probabilities ∝ weight.

    Deterministic: ``u`` is the md5-uniform of ``(id, salt)`` (the
    repo's ``sample_exact`` reproducibility guarantee), and the key is
    compared as ``ln(u)/w`` — the monotone log form, division instead
    of ``pow`` — rounded to 6dp with ties broken by id, so re-runs,
    partitionings, and engines select the same rows. Rows with
    ``weight <= 0`` or NULL are excluded (zero mass cannot be drawn).

    Scale shape (10^10 rows, 1000 executors): the key is a scan-stage
    expression and the selection is ``orderBy(desc(key), id).limit(k)``
    — TakeOrderedAndProject, each task keeps a k-row heap and the
    driver merges partials; NO window, NO global sort, NO shuffle of
    the full corpus (the class the r02 bm25 fix established).

    Returns the selected rows as ``(id_col, weight_col, es_key)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u01 = (_md5_u32(id_col, salt) + 0.5) / F.lit(_U32)
    w = F.col(weight_col).cast("double")
    keyed = (
        df.where(F.col(weight_col).isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            F.col(weight_col),
            F.round(F.log(u01) / w, 6).alias("es_key"),
        )
    )
    return keyed.orderBy(F.desc("es_key"), F.col(id_col)).limit(k)


def soft_dedup_weights(
    corpus: DataFrame,
    clusters: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Soft deduplication: keep every copy, DOWNWEIGHT duplicates — the
    sampling/loss-reweighting alternative to destructive dedup (SoftDeDup,
    He et al. 2024): dropping all-but-one copy throws away the natural
    upweighting of genuinely popular content AND risks keeping the worst
    copy; weighting each member of a duplicate cluster ``1/|cluster|``
    preserves the corpus distribution while removing the duplication
    gradient bias. The weight multiplies the per-document sampling rate
    (:func:`weighted_sample_k`) or the per-token loss downstream.

    ``clusters`` is any ``(id_col, cluster_col)`` assignment —
    ``graph.dedup_clusters`` output for near-dup transitive clusters;
    when None, exact clusters via the md5 text fingerprint (the cheap
    tier). Unclustered documents keep weight 1.0.

    Adds ``cluster_size``, ``weight`` = 1/cluster_size, ``n_tokens``
    and ``weighted_tokens`` (weight * n_tokens, the document's
    contribution to the EFFECTIVE corpus size — sum it per slice to see
    how much unique signal survives the downweighting). Weights round
    to 6dp (cross-engine float convention).

    Scale shape: one exchange on the cluster key for the size count,
    one slim join back on the id — both map-side partial; token counts
    ride the corpus scan. No windows, no Python.
    """
    from commoncrawl_spark.operators.analytics import tokens_col

    if clusters is None:
        clusters = corpus.select(
            F.col(id_col), F.md5(F.col(text_col)).alias(cluster_col))
    sizes = (
        clusters.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    assigned = clusters.join(sizes, cluster_col).select(
        id_col, "cluster_size")
    return (
        corpus.join(assigned, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            F.round(1.0 / F.coalesce("cluster_size", F.lit(1)), 6)
            .alias("weight"),
            F.size(tokens_col(F.col(text_col))).cast("long")
            .alias("n_tokens"),
        )
        .withColumn(
            "weighted_tokens",
            F.round(F.col("weight") * F.col("n_tokens"), 6))
    )


# ---------------------------------------------------------------------------
# Data-constrained epoch planning (waterfilling under per-source caps)
# ---------------------------------------------------------------------------


def epoch_plan(
    source_tokens: DataFrame,
    budget: float,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    cap_col: str = "max_epochs",
) -> DataFrame:
    """How many epochs of each source to train on, given a total token
    budget and per-source repetition caps — the Muennighoff et al.
    (NeurIPS 2023) data-constrained regime where repeating a source
    beyond ~4 epochs stops helping, so scarce high-quality sources cap
    high and bulk web caps low. Solves the waterfilling equation
    sum_s(tokens_s * min(e, cap_s)) = budget for the uniform epoch
    level e, then reports per source: ``(group, n_tokens, max_epochs,
    epochs, alloc_tokens)`` with epochs = min(e, cap) rounded 6dp.
    If the budget exceeds full saturation every source trains at its
    cap (the plan under-fills; the caller sees it in sum(alloc)).

    WINDOW-FREE breakpoint search: for each distinct cap value c,
    assume sources with cap < c are saturated — e(c) = (budget -
    sum_{cap<c} tokens*cap) / sum_{cap>=c} tokens — and keep the
    candidate where prev-cap <= e(c) < c. That is one conditional
    aggregate per candidate over the SOURCE table (cap-cardinality x
    source-cardinality join rows, both bounded: sources are a
    histogram of the corpus, caps a config ladder), never a global
    sort. DETERMINISM CONTRACT: caps must be dyadic (4.0, 2.0, 1.0,
    0.5...) so tokens*cap is exact in double and the saturated sums
    are order-independent; the one division lands on the 6dp grain.

    Scale shape: the input is already per-source (the caller's one
    map-side-partial aggregate over the corpus); everything here is
    joins and aggregates over that bounded table — no corpus rescan,
    no window, no Python."""
    toks = F.col(tokens_col).cast("double")
    caps = source_tokens.select(F.col(cap_col).alias("_c")).distinct()
    cand = (
        caps.crossJoin(source_tokens.select(
            F.col(cap_col).alias("_cap"), toks.alias("_t")))
        .groupBy("_c")
        .agg(
            F.sum(F.when(F.col("_cap") < F.col("_c"),
                         F.col("_t") * F.col("_cap"))
                  .otherwise(F.lit(0.0))).alias("_sat"),
            F.sum(F.when(F.col("_cap") >= F.col("_c"), F.col("_t"))
                  .otherwise(F.lit(0.0))).alias("_un"),
            F.max(F.when(F.col("_cap") < F.col("_c"), F.col("_cap"))
                  .otherwise(F.lit(0.0))).alias("_prev"),
        )
        .withColumn("_e", (F.lit(float(budget)) - F.col("_sat"))
                    / F.col("_un"))
        .filter((F.col("_e") >= F.col("_prev")) & (F.col("_e") < F.col("_c")))
        .agg(F.min("_e").alias("_level"))
    )
    out = source_tokens.crossJoin(F.broadcast(cand))
    epochs = F.round(
        F.least(F.coalesce(F.col("_level"), F.col(cap_col).cast("double")),
                F.col(cap_col).cast("double")), 6)
    return out.select(
        F.col(group_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col(cap_col).cast("double").alias("max_epochs"),
        epochs.alias("epochs"),
        F.round(toks * epochs, 6).alias("alloc_tokens"),
    )


def materialize_epochs(
    docs: DataFrame,
    plan: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    epochs_col: str = "epochs",
    seed: str = "ep",
) -> DataFrame:
    """Turn an :func:`epoch_plan` allocation into the actual training
    stream: each document of a group with ``epochs = 3.63`` appears in
    3 full epochs plus — with probability 0.63, decided by its own
    md5-uniform draw — a 4th partial epoch, so every group's expected
    token contribution matches the plan (the same
    expectation-contract as ``sample_token_budget``). Every copy gets
    an ``order_key`` = md5(seed|epoch|id): sorting any epoch's shard
    by it yields that epoch's shuffle, different per epoch, with NO
    materialized permutation and NO RNG state — the property that
    makes a 10^10-doc stream resumable at an arbitrary offset.

    Output: ``(id_col, group_col, epoch, order_key)``. Scale shape:
    one broadcast join against the group-cardinality plan, a per-row
    guarded sequence explode (bounded by ceil(epochs)), and scan-stage
    hash arithmetic — no shuffle beyond whatever the caller's sink
    needs."""
    j = docs.select(id_col, group_col).join(
        F.broadcast(plan.select(group_col, epochs_col)), group_col)
    e = F.col(epochs_col)
    full = F.floor(e).cast("int")
    frac = e - F.floor(e)
    u = (F.conv(F.substring(F.md5(F.concat(
        F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0))
    n_copies = (full + F.when(u < frac, 1).otherwise(0)).alias("_n")
    ws = F.when(n_copies > 0,
                F.sequence(F.lit(0), n_copies - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return j.select(
        F.col(id_col), F.col(group_col),
        F.explode(ws).alias("epoch"),
    ).withColumn(
        "order_key",
        F.md5(F.concat(F.lit(seed), F.lit("|"),
                       F.col("epoch").cast("string"), F.lit("|"),
                       F.col(id_col).cast("string"))))
