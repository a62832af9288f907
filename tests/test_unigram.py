"""Unigram-LM tokenizer: seed, hard-EM training, encoding."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from commoncrawl_spark.operators.unigram import (
    _logp_from_counts,
    seed_vocab,
    train_unigram,
    unigram_encode_udf,
    unigram_token_counts,
    unigram_vocab_dict,
    viterbi_segment,
    word_histogram,
)


def test_viterbi_prefers_higher_logprob_then_fewer_pieces():
    logp = _logp_from_counts(
        {"data": 50, "da": 10, "ta": 10, "d": 1, "a": 2, "t": 1})
    assert viterbi_segment("data", logp) == ["data"]
    # remove the whole-word piece: "da"+"ta" (2 pieces) beats 4 chars
    logp2 = _logp_from_counts({"da": 10, "ta": 10, "d": 1, "a": 2, "t": 1})
    assert viterbi_segment("data", logp2) == ["da", "ta"]


def test_viterbi_tiebreak_is_lexicographic():
    # equal-count pieces -> equal logp; "ab"+"cd" vs "abc"+"d" have
    # equal cost and piece count; joined-path tiebreak picks "ab\x1fcd"
    logp = _logp_from_counts({"ab": 5, "cd": 5, "abc": 5, "d": 5})
    assert viterbi_segment("abcd", logp) == ["ab", "cd"]


def test_viterbi_unreachable_returns_none():
    assert viterbi_segment("xyz", {"x": -1.0}, 6) is None


def _docs(spark):
    rows = [Row(doc_id=i,
                text=("data pipeline " * 3 + "datum pipe ") * 2)
            for i in range(6)]
    rows += [Row(doc_id=100 + i, text="scan batch scan batch data")
             for i in range(4)]
    return spark.createDataFrame(rows)


def test_seed_vocab_counts_and_coverage(spark):
    hist = word_histogram(_docs(spark))
    seed = seed_vocab(hist, max_piece_len=4, seed_size=10)
    got = {r["piece"]: r["count"] for r in seed.collect()}
    # every char of every word present (coverage guarantee)
    for ch in "datpipelnumscbh":
        assert ch in got
    # occurrence-weighted: "at" occurs in data(1), datum(1) per word
    hist_rows = {r["word"]: r["freq"] for r in hist.collect()}
    want_at = hist_rows["data"] + hist_rows["datum"] + hist_rows["batch"]
    assert got["at"] == want_at


def test_train_counts_match_pure_python_replay(spark):
    d = _docs(spark)
    hist = word_histogram(d)
    seed = seed_vocab(hist, max_piece_len=4, seed_size=12)
    vocab = train_unigram(hist, seed, n_iter=2, max_piece_len=4)
    got = {r["piece"]: r["count"] for r in vocab.collect()}

    # pure-python replay of the same algorithm
    hrows = {r["word"]: int(r["freq"]) for r in hist.collect()}
    counts = {r["piece"]: int(r["count"]) for r in seed.collect()}
    chars = {p for p in counts if len(p) == 1}
    for _ in range(2):
        logp = _logp_from_counts(counts)
        tally: dict[str, int] = {}
        for w, f in hrows.items():
            for p in viterbi_segment(w, logp, 4) or list(w):
                tally[p] = tally.get(p, 0) + f
        counts = tally
        for ch in chars:
            counts.setdefault(ch, 1)
    assert got == counts


def test_encode_udf_matches_kernel_and_counts(spark):
    d = _docs(spark)
    hist = word_histogram(d)
    vocab = train_unigram(hist, seed_vocab(hist, 4, 12), n_iter=1,
                          max_piece_len=4)
    logp = unigram_vocab_dict(vocab)
    enc = unigram_encode_udf(logp, max_piece_len=4)
    row = d.filter(F.col("doc_id") == 100).select(
        enc(F.col("text")).alias("pieces")).collect()[0]
    want = []
    for w in "scan batch scan batch data".split():
        want.extend(viterbi_segment(w, logp, 4))
    assert row["pieces"] == want

    counts = {r["doc_id"]: r for r in
              unigram_token_counts(d, vocab, max_piece_len=4).collect()}
    assert counts[100]["n_pieces"] == len(want)
    assert counts[100]["n_words"] == 5


def test_train_is_partition_invariant(spark):
    d = _docs(spark)
    hist = word_histogram(d)
    seed = seed_vocab(hist, 4, 12)
    a = {(r["piece"], r["count"])
         for r in train_unigram(hist.repartition(1), seed,
                                n_iter=1, max_piece_len=4).collect()}
    b = {(r["piece"], r["count"])
         for r in train_unigram(hist.repartition(7), seed,
                                n_iter=1, max_piece_len=4).collect()}
    assert a == b


def test_oracle_unroll_bound_covers_corpus_word_lengths():
    # the DuckDB oracle unrolls the Viterbi DP to a fixed maxlen
    # (__spark_entry__._sql_unigram_chain call site, 12); a longer
    # token would silently vanish from the oracle's vit CTE.
    import duckdb
    for sf in ("0.001", "0.01", "0.1"):
        mx = duckdb.sql(
            "SELECT max(length(x)) FROM (SELECT unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'),"
            " t -> t <> '')) AS x FROM "
            f"'/root/testdata/sf{sf}/documents.parquet')").fetchone()[0]
        assert mx <= 12, (sf, mx)


def test_oracle_replays_trained_not_seed_segmentation():
    """ADVICE r3: the unigram_tokens oracle must source n_pieces from
    the TRAINED-model Viterbi (vit2 — what unigram_token_counts after
    train_unigram actually encodes with), not the seed-model pass
    (vit). On this corpus the two genuinely diverge ('aabaaa' is 3
    pieces under the seed model, 4 under the trained one), so sourcing
    from vit would be wrong here — the divergence the old oracle only
    escaped on closed vocabularies."""
    import duckdb

    import __spark_entry__ as e
    from commoncrawl_spark.operators.unigram import (
        _logp_from_counts,
        viterbi_segment,
    )

    hist = {"aabaaa": 9, "aba": 8, "abbaaa": 9, "baa": 1}
    mpl, seed_size = 3, 4
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"(repeat('{w} ', {f}))" for w, f in hist.items())
                + ") t(text)")
    chain = e._sql_unigram_chain(maxlen=6, mpl=mpl, seed_size=seed_size)
    vit1 = dict(con.execute(
        f"WITH {chain} SELECT word, len(path) FROM vit").fetchall())
    vit2 = dict(con.execute(
        f"WITH {chain} SELECT word, len(path) FROM vit2").fetchall())

    # pure-Python replay of seed -> one hard-EM round -> encode
    from collections import Counter
    pc = Counter()
    for w, f in hist.items():
        for i in range(len(w)):
            for ln in range(1, min(mpl, len(w) - i) + 1):
                pc[(w[i:i + ln], ln)] += f
    multi = sorted(((p, c) for (p, ln), c in pc.items() if ln >= 2),
                   key=lambda x: (-x[1], x[0]))[:seed_size]
    seed = dict(multi + [(p, c) for (p, ln), c in pc.items() if ln == 1])
    lp_seed = _logp_from_counts(seed)
    tally = Counter()
    for w, f in hist.items():
        for p in viterbi_segment(w, lp_seed, mpl) or list(w):
            tally[p] += f
    trained = dict(tally)
    for p in seed:
        if len(p) == 1:
            trained.setdefault(p, 1)
    lp_tr = _logp_from_counts(trained)

    want_seed = {w: len(viterbi_segment(w, lp_seed, mpl))
                 for w in hist}
    want_tr = {w: len(viterbi_segment(w, lp_tr, mpl)) for w in hist}
    assert vit1 == want_seed
    assert vit2 == want_tr
    assert want_seed["aabaaa"] == 3 and want_tr["aabaaa"] == 4
    assert vit1 != vit2
