"""SymSpell-style fuzzy vocabulary matching (Garbe's symmetric-delete
algorithm): find, for each (possibly misspelled) query term, the corpus
vocabulary words within Levenshtein distance 1 — the spell-correction /
query-normalization primitive a search stack puts in front of BM25, and
the OCR/typo-variant collapser a corpus-curation pipeline runs over
harvested anchor text.

Why symmetric deletes and not a distance join: ``levenshtein`` is not an
equi-join key, so the naive form is a vocab x query cartesian — the one
shape this repo bans. The symmetric-delete trick restores an EQUI join:
two words are within edit distance 1 iff their identity-augmented
delete-1 key sets intersect (delete covers insertion, insertion covers
deletion, and deleting the differing position from both sides covers
substitution). Keys are generated scan-stage on both sides, the join is
a plain equi-join on short string keys, and ``levenshtein`` runs only on
the candidate pairs the key join surfaced — verification, not search.

Scale shape: the vocabulary frame is token-histogram sized (vocab, not
corpus — the corpus explode happens once and aggregates map-side
partial); key expansion multiplies it by ~(avg word length + 1) slim
rows. The query side is query-sized. No cartesian, no window over
unbounded groups: per-term candidate sets are delete-neighborhood sized
(bounded by vocabulary shape, not corpus size), ranked with the bounded
array fold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import tokens_col


def delete_variants_col(term: Column) -> Column:
    """Identity-augmented delete-1 key set for a term: the term itself
    plus every string formed by removing one character — scan-stage
    array expressions, no Python. Distinct (repeated characters yield
    repeated keys)."""
    n = F.length(term)
    deletes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            term.substr(F.lit(1), i - F.lit(1)),
            term.substr(i + F.lit(1), n - i),
        ),
    )
    return F.array_distinct(
        F.when(n >= 1, F.concat(F.array(term), deletes))
        .otherwise(F.array(term))
    )


def vocab_histogram(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
) -> DataFrame:
    """``(term, freq)`` corpus vocabulary — one tokenize explode with a
    map-side-partial count (the shuffle carries (token, partial-count)
    rows, vocabulary-sized after combine). ``min_freq`` drops hapax
    noise (OCR junk is overwhelmingly frequency-1)."""
    out = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def fuzzy_term_candidates(
    vocab: DataFrame,
    query_terms: Sequence[str],
    spark: SparkSession | None = None,
    max_edit: int = 1,
    top_k: int = 3,
) -> DataFrame:
    """For each query term, the vocabulary words within Levenshtein
    distance ``max_edit`` ranked by (distance asc, freq desc, term asc)
    — SymSpell's ordering: an exact hit always outranks corrections,
    then the more common word wins. Returns
    ``(query_term, candidate, dist, freq, rank)``, at most ``top_k``
    rows per query term; query terms with no candidate in the
    vocabulary produce no rows (surface them by anti-joining the
    output if "unknown term" matters to the caller).

    Only ``max_edit=1`` is supported: the delete-1 key set is the
    exact cover for distance 1. Distance 2 squares the key fan-out
    (delete-2 keys) — a different cost class that should be an
    explicit caller decision, so it is refused rather than silently
    generated.

    Scale shape: see module docstring — vocab-sized key explode, query
    equi-join, bounded verification.
    """
    if max_edit != 1:
        raise ValueError(
            f"only max_edit=1 is supported (got {max_edit}); "
            "delete-2 key fan-out is a different cost class")
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if spark is None:
        spark = vocab.sparkSession
    q = spark.createDataFrame(
        [(t,) for t in terms], "query_term string")
    qkeys = q.select(
        "query_term",
        F.explode(delete_variants_col(F.col("query_term"))).alias("_k"))
    vkeys = vocab.select(
        F.col("term").alias("candidate"), "freq",
        F.explode(delete_variants_col(F.col("term"))).alias("_k"))
    # query side is tiny (a query, not a corpus) -> broadcast it; the
    # vocab key stream is the big side and never re-partitions
    pairs = (
        vkeys.join(F.broadcast(qkeys), "_k")
        .select("query_term", "candidate", "freq").distinct()
        .withColumn(
            "dist", F.levenshtein(F.col("query_term"), F.col("candidate")))
        .filter(F.col("dist") <= max_edit)
    )
    # per-term top-k: candidate sets are delete-neighborhood sized, so
    # the per-group array is bounded by vocabulary shape — sort + slice
    # + posexplode, window-free
    row = F.struct(
        F.col("dist").alias("_d"),
        (-F.col("freq")).alias("_nf"),
        F.col("candidate").alias("_c"),
        F.col("freq").alias("_f"),
    )
    return (
        pairs.select("query_term", row.alias("_r"))
        .groupBy("query_term")
        .agg(F.slice(F.array_sort(F.collect_list("_r")),
                     1, top_k).alias("_rs"))
        .select(
            "query_term",
            F.posexplode("_rs").alias("_pos", "_r"))
        .select(
            "query_term",
            F.col("_r._c").alias("candidate"),
            F.col("_r._d").alias("dist"),
            F.col("_r._f").alias("freq"),
            (F.col("_pos") + 1).alias("rank"),
        )
    )


def corrected_bm25_search(
    df: DataFrame,
    terms: Sequence[str],
    min_freq: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Did-you-mean retrieval: SymSpell-correct each query term against
    the corpus vocabulary (rank-1 candidate by dist asc, freq desc,
    term asc — a correctly spelled in-vocabulary term corrects to
    ITSELF at distance 0), then Okapi BM25 over the corrected term set
    — the search stack's standard correct-then-rank composition.

    A query term with NO vocabulary word within edit distance 1 is
    dropped (there is nothing defensible to search for; surface it by
    anti-joining :func:`fuzzy_term_candidates` if "no results for X"
    matters to the caller). Two misspellings correcting to the same
    word collapse — BM25 scores a term SET.

    Scale shape: zero driver data — the corrected terms stay a
    DataFrame (query-sized) and replace :func:`bm25_search`'s
    ``isin`` literal filter with a BROADCAST semi-join on the token,
    so the corpus tf stream is pruned pre-shuffle exactly as the
    literal filter would. The corpus is tokenized twice (vocabulary
    histogram + tf stream), both map-side-partial aggregates; at
    deployment scale the vocabulary is built once and persisted, not
    rebuilt per query."""
    from .index import _bm25_rank

    cand = fuzzy_term_candidates(
        vocab_histogram(df, text_col=text_col, min_freq=min_freq),
        terms, spark=df.sparkSession, top_k=1)
    corrected = cand.select(F.col("candidate").alias("token")).distinct()
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
        .join(F.broadcast(corrected), "token", "semi")
        .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_tf"))
    )
    return _bm25_rank(tf, doclen, globals_, k1, b, top_k, id_col)
