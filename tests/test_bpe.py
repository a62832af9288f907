"""BPE trainer/encoder: the distributed loop must reproduce the pure-
Python reference exactly (same histogram, same tie-breaks, same LTR
greedy merge), and both encode paths (Catalyst fold chain, pandas UDF)
must agree with ``bpe_encode_word``."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawl_spark.operators.bpe import (
    END,
    bpe_encode_col,
    bpe_encode_udf,
    bpe_encode_word,
    bpe_merge_word,
    bpe_train,
    bpe_train_reference,
    merges_table,
)


def test_reference_trainer_classic_example():
    # Sennrich et al.'s worked example shape: 'est</w>' assembles first
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_reference(freqs, 4)
    # (e,s) wins round 1 on the lexicographic tie with (s,t), (t,</w>)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", END, 9)
    # after est</w> is fused, 'l o' (5+2) is the heaviest remaining pair
    assert merges[3] == ("l", "o", 7)


def test_merge_word_ltr_greedy_nonoverlapping():
    # runs of identical symbols merge left-to-right: a just-fused 'aa'
    # cannot re-trigger as 'a'
    assert bpe_merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert bpe_merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert bpe_encode_word("aaa", [("a", "a"), ("aa", "a")]) == [
        "aaa", END]


def test_distributed_trainer_matches_reference(spark):
    import re

    from commoncrawl_spark.operators.analytics import TOKEN_RE

    texts = [
        "the lowest tower lowers slowly",
        "newest widest lowest",
        "the tower of the west",
        "low low low lower newest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    # same histogram the Spark trainer derives (shared tokenizer)
    freqs: dict[str, int] = {}
    for t in texts:
        for w in re.split(TOKEN_RE, t.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    want = bpe_train_reference(freqs, 8)
    got = bpe_train(df, n_merges=8)
    assert got == want


def test_encode_paths_agree(spark):
    df = spark.createDataFrame(
        [(1, "the lowest tower"), (2, "aaa baa"), (3, None), (4, "")],
        "doc_id long, text string")
    merges = [("a", "a", 9), ("t", "h", 7), ("th", "e", 6), ("aa", "a", 3)]
    pairs = [(a, b) for a, b, _ in merges]

    jvm = df.select("doc_id",
                    bpe_encode_col(F.col("text"), merges).alias("toks"))
    udf = df.select("doc_id",
                    bpe_encode_udf(merges)(F.col("text")).alias("toks"))
    jvm_rows = {r["doc_id"]: r["toks"] for r in jvm.collect()}
    udf_rows = {r["doc_id"]: r["toks"] for r in udf.collect()}

    import re

    from commoncrawl_spark.operators.analytics import TOKEN_RE

    def ref(t):
        out = []
        for w in re.split(TOKEN_RE, t.lower()):
            if w:
                out.extend(bpe_encode_word(w, pairs))
        return out

    assert jvm_rows[1] == udf_rows[1] == ref("the lowest tower")
    assert jvm_rows[2] == udf_rows[2] == ref("aaa baa")
    # null text: the JVM path yields an empty token list from a null
    # tokenize (flatten over null -> null), the UDF preserves null;
    # both are "no tokens" — pin each path's exact behavior
    assert udf_rows[3] is None and jvm_rows[3] is None
    assert jvm_rows[4] == udf_rows[4] == []


def test_trainer_argmax_is_take_ordered(spark):
    # the per-iteration argmax must be orderBy+limit
    # (TakeOrderedAndProject), never a global Window — asserted on the
    # REAL per-iteration frame the trainer runs (pair_count_top)
    from commoncrawl_spark.operators.bpe import (
        _char_symbols,
        pair_count_top,
        word_histogram,
    )

    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    words = word_histogram(df).select(
        "word", "freq", _char_symbols(F.col("word")).alias("syms"))
    top = pair_count_top(words)
    top.collect()
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_merges_table_shape(spark):
    t = merges_table(spark, [("a", "b", 5), ("ab", "c", 3)])
    rows = t.collect()
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["left"] == "a" and rows[1]["pair_freq"] == 3


def test_distributed_trainer_deep_loop_and_min_freq(spark):
    """32 merges on a larger corpus — the loop's localCheckpoint
    lineage truncation and the argmax tie-breaks hold far past the
    oracle-sized 6; min_freq prunes the histogram identically on both
    sides."""
    import re

    from commoncrawl_spark.operators.analytics import TOKEN_RE

    texts = [
        " ".join(f"w{(i * j) % 23}x{(i + j) % 7}" for j in range(30))
        for i in range(40)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    freqs: dict[str, int] = {}
    for t in texts:
        for w in re.split(TOKEN_RE, t.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1

    got = bpe_train(df, n_merges=32, min_freq=2)
    pruned = {w: f for w, f in freqs.items() if f >= 2}
    want = bpe_train_reference(pruned, 32)
    assert got == want
    assert len(got) == 32


def test_bpe_encode_fuzz_vs_reference(spark):
    """Seeded random merge tables + random words: the Catalyst fold
    chain equals the pure-Python encoder everywhere, including
    identical-symbol runs and merges built from earlier merges."""
    import random

    rng = random.Random(99)
    alphabet = "abc"
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
             for _ in range(60)]
    merges = [("a", "a", 9), ("a", "b", 8), ("aa", "b", 7),
              ("b", "c", 6), ("aab", END, 5), ("c", "c", 4)]
    pairs = [(a, b) for a, b, _ in merges]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    out = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_encode_col(F.col("text"), merges).alias("toks")
    ).collect()}
    for i, w in enumerate(words):
        assert out[i] == bpe_encode_word(w, pairs), (w, out[i])
