"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB shape this enables: distinct-count questions ("how many
unique URLs per host has this crawl ever seen?") answered WITHOUT
rescanning history. Each snapshot builds one fixed-size (~2^lgk bytes)
sketch per key at write time; any union of snapshots is answered by
merging sketches — a groupBy over tiny binary blobs — instead of a
count_distinct over the raw union, which at 10^10 URLs re-shuffles the
entire corpus every time the question is asked. Sketches are
commutative/associative (HLL registers combine by max), so merge order,
partitioning, and snapshot arrival order cannot change the result.

Accuracy contract: DataSketches HLL is EXACT while a key's cardinality
fits the sketch's sparse/coupon mode (thousands of values at lgk=12),
then degrades gracefully to ~1.04/sqrt(2^lgk) relative standard error
(~1.6% at lgk=12). The driver query's oracle leans on the exact regime
at test scale; ``tests/test_sketches.py`` pins the estimation-regime
tolerance at 200k distinct values.

All JVM-side declarative aggregates — map-side partial sketching, one
exchange on the key, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # ~1.6% RSE, 4 KiB dense sketch


def build_sketches(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch per key group over ``val_col``:
    ``(*key_cols, sketch binary, n_rows)``. Run once per snapshot at
    write time; the output is the compact, mergeable summary that makes
    every later distinct-count question history-free.

    Scale shape: hll_sketch_agg is a declarative aggregate — partial
    sketches build map-side and only (key, ~2^lgk-byte blob) rows cross
    the single exchange."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(val_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    *sketch_tables: DataFrame,
    key_cols: list[str],
    allow_different_lgk: bool = False,
) -> DataFrame:
    """Union N per-snapshot sketch tables and merge per key:
    ``(*key_cols, sketch, n_rows)`` where ``sketch`` covers every
    snapshot's values and ``n_rows`` sums raw row counts. Register-max
    merging makes this insensitive to order and to duplicate values
    across snapshots — the whole point: re-seen URLs don't double-count.

    ``allow_different_lgk`` permits merging sketches built at different
    precisions (the union downgrades to the coarsest), for rolling
    deployments where lgk changed between snapshots."""
    if not sketch_tables:
        raise ValueError("need at least one sketch table")
    u = sketch_tables[0]
    for t in sketch_tables[1:]:
        u = u.unionByName(t)
    return u.groupBy(*key_cols).agg(
        F.hll_union_agg(F.col("sketch"), F.lit(allow_different_lgk))
        .alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )


def estimate_cardinality(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct-count estimates from a sketch table:
    ``(*key_cols, distinct_est, n_rows)``. Metadata-cheap — one
    expression over blobs already the size of the key space, no
    exchange."""
    return df.select(
        *key_cols,
        F.hll_sketch_estimate(F.col("sketch")).alias("distinct_est"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency summaries
# ---------------------------------------------------------------------------

_SEP = "\x1f"


def _cms_bucket(key, d: int, width: int):
    """Row-``d`` CMS bucket for ``key``: md5-based so DuckDB replays it
    bit-for-bit ('0x'||hex ::BIGINT == conv(hex,16,10))."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(d)), F.lit(_SEP), key)), 1, 8),
        16, 10).cast("long")
    return (h % width).alias("bucket")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    count_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
    over ``key_col``: a depth x width counter matrix as ``(d, bucket,
    count)`` rows — the fixed-size, MERGEABLE frequency summary. Point
    estimates are min-over-rows, guaranteed >= the true count, within
    eN/width with probability 1 - (1/2)^depth.

    The 100 TB shape: per-snapshot sketches are depth*width rows
    REGARDLESS of corpus size; "how often has this URL ever appeared"
    across a year of snapshots is a sum-groupBy over tiny matrices
    (:func:`cms_merge`), never a rescan. Counters are plain sums, so
    map-side partial aggregation collapses each partition's keys before
    the one exchange on (d, bucket); ``count_col`` weights rows (e.g.
    pre-aggregated counts) instead of counting them.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    cnt = F.lit(1) if count_col is None else F.col(count_col)
    rows = None
    for d in range(depth):
        r = df.select(
            F.lit(d).alias("d"),
            _cms_bucket(F.col(key_col), d, width),
            cnt.cast("long").alias("_c"))
        rows = r if rows is None else rows.unionByName(r)
    return rows.groupBy("d", "bucket").agg(F.sum("_c").alias("count"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS matrices built with the same (depth, width): cellwise
    sum — commutative and associative, so snapshot order cannot change
    the result."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("count").alias("count"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key in ``keys`` against a CMS matrix:
    ``(key, est)`` with est = min over the depth rows (missing buckets
    read 0). Always >= the true count — CMS never undercounts.

    Scale shape: keys explode into depth slim probe rows, equi-join
    the (d, bucket)-keyed sketch (broadcast — it is depth x width rows
    by construction), then a min aggregate on the key; no windows."""
    probes = None
    for d in range(depth):
        r = keys.select(
            F.col(key_col), F.lit(d).alias("d"),
            _cms_bucket(F.col(key_col), d, width))
        probes = r if probes is None else probes.unionByName(r)
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: exact phi-frequent items, candidate-sized state
# ---------------------------------------------------------------------------


def misra_gries_py(stream, m: int) -> dict:
    """Misra-Gries fold (Misra & Gries, Sci. Comput. Program. 1982) with
    ``m`` counters over an item stream: returns ``{item: lower_bound}``.
    GUARANTEE: every item whose true count exceeds n/(m+1) survives, and
    each kept bound undercounts by at most n/(m+1). Pure deterministic
    function — the executor kernel AND the pytest oracle, in the
    cdc.py shared-kernel style."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    counters: dict = {}
    for item in stream:
        if item in counters:
            counters[item] += 1
        elif len(counters) < m:
            counters[item] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def misra_gries_weighted_py(pairs, m: int) -> dict:
    """Weighted Misra-Gries (Berinde et al., PODS 2009 §2: insert with
    weight w; on overflow subtract the minimum counter from all and
    drop zeros): same guarantee as the unit fold — every item with
    total weight > W/(m+1) survives, undercount <= W/(m+1) — but the
    stream can be PRE-AGGREGATED (item, weight) pairs. That is the
    fast executor path: a C-speed ``Counter`` per Arrow batch, then
    this fold over batch-vocabulary-many pairs instead of a Python
    loop over every token."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    counters: dict = {}
    for item, w in pairs:
        if w <= 0:
            continue
        if item in counters:
            counters[item] += w
        elif len(counters) < m:
            counters[item] = w
        else:
            d = min(counters.values())
            if w <= d:
                # the newcomer dies first: equivalent to inserting it
                # then subtracting w from everything (w == d also kills
                # the old minimum, so zeros must still be swept)
                dead = []
                for c in counters:
                    counters[c] -= w
                    if counters[c] == 0:
                        dead.append(c)
                for c in dead:
                    del counters[c]
            else:
                dead = []
                for c in counters:
                    counters[c] -= d
                    if counters[c] == 0:
                        dead.append(c)
                for c in dead:
                    del counters[c]
                counters[item] = w - d
    return counters


def heavy_hitters(
    df: DataFrame,
    arr_col: str = "tokens",
    k: int = 100,
) -> DataFrame:
    """EXACT heavy hitters: every token whose corpus count ``cnt``
    satisfies ``cnt * k >= n`` (n = total token count), as
    ``(token, cnt, share)`` ordered by count — the two-pass
    Misra-Gries shape (candidates, then exact recount).

    Why not plain word-count? ``explode + groupBy`` shuffles one row
    per DISTINCT key — fine for words, corpus-scale for URLs or
    n-grams where the vocabulary grows with the data. Here the shuffle
    is CANDIDATE-sized at any vocabulary:

    - Pass 1 (``mapInPandas``, a sanctioned Arrow-batched Python site —
      a decrement-all counter fold has no Catalyst expression): each
      partition folds its token stream through :func:`misra_gries_py`
      with m = k counters and emits at most k candidate tokens. State
      is O(k) per task regardless of partition size; only P*k slim
      rows leave the stage.
    - Superset proof: if an item's global count c >= n/k, then by
      averaging some partition i has c_i >= n_i/k > n_i/(k+1), so MG
      with k counters keeps it there — the distinct-union of
      per-partition survivors contains every global heavy hitter.
    - Pass 2: exact recount of candidates only — explode, broadcast
      LEFT SEMI probe against the candidate set (P*k rows by
      construction), then a map-side-partial count whose exchange
      carries at most the candidate cardinality. The n/k gate uses
      integer arithmetic (``cnt * k >= n``), so the output is
      bit-deterministic and independent of partitioning: false
      candidates are filtered, true ones were never lost.

    Space-Saving (Metwally et al., ICDT 2005) is the always-increment
    twin with the same guarantee; MG is chosen for its smaller
    per-step state. ``share`` is round(cnt/n, 6) per the repo's float
    compare grain.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import itertools
    from collections import Counter

    import pandas as pd

    def part(batches):
        # C-speed per-batch histogram, then the weighted MG fold over
        # batch-vocabulary-many (item, count) pairs — same candidate
        # guarantee as the token-at-a-time fold (misra_gries_weighted_py
        # docstring), ~10x less Python per token
        def pairs():
            for pdf in batches:
                c = Counter(itertools.chain.from_iterable(
                    arr for arr in pdf[arr_col] if arr is not None))
                yield from c.items()
        yield pd.DataFrame(
            {"token": list(misra_gries_weighted_py(pairs(), k))})

    cand = (
        df.select(F.col(arr_col).alias(arr_col))
        .mapInPandas(part, "token string")
        .distinct()
    )
    toks = df.select(F.explode(F.col(arr_col)).alias("token"))
    n = df.agg(
        F.sum(F.coalesce(F.size(F.col(arr_col)), F.lit(0)))
        .cast("long").alias("n"))
    return (
        toks.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * k >= F.col("n"))
        .select(
            "token", "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"))
        .orderBy(F.desc("cnt"), F.asc("token"))
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k sketch: mergeable fixed-size samples + distinct counts
# ---------------------------------------------------------------------------

KMV_HASH_SPACE = 4294967296.0  # 2^32: md5-prefix hashes map to [0, 1)


def kmv_build(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    k: int = 64,
    salt_buckets: int = 16,
) -> DataFrame:
    """Bottom-k (KMV) sketch per key group (Bar-Yossef et al. 2002):
    the ``k`` smallest md5-hash values of the group's distinct
    ``val_col`` members, as ``(*key_cols, hashes: array<long>,
    members: array<string>)`` with both arrays aligned ascending.
    Two summaries in one fixed-size blob: a MERGEABLE uniform sample
    of the group's distinct members (min-hash of a union is the union
    of min-hashes) and a distinct-count estimator — the deterministic
    complement to the HLL sketch, with the sample HLL cannot give.

    Scale shape: (key, value) distinct first, then the SALTED
    two-stage keyed top-k (build_champion_lists' exactness argument:
    any true bottom-k row is in the bottom-k of its own salt bucket),
    so a hot key's corpus-sized value stream splits across
    ``salt_buckets`` tasks and no window is partition-less. The final
    collect_list is bounded by construction (<= k rows per key reach
    it)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.col(val_col).cast("string")
    h = F.conv(F.substring(F.md5(v), 1, 8), 16, 10).cast("long")
    dv = df.select(*key_cols, v.alias("_v"), h.alias("_h")).distinct()
    order = [F.col("_h").asc(), F.col("_v").asc()]
    salted = dv.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("_v")), F.lit(salt_buckets)).cast("int"))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    bottom = (
        survivors.withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= k))
    return (
        bottom.groupBy(*key_cols)
        .agg(
            F.array_sort(F.collect_list(F.struct("_h", "_v")))
            .alias("_pairs"))
        .select(
            *key_cols,
            F.transform(F.col("_pairs"), lambda p: p["_h"])
            .alias("hashes"),
            F.transform(F.col("_pairs"), lambda p: p["_v"])
            .alias("members"))
    )


def kmv_merge(*sketches: DataFrame, key_cols: list[str],
              k: int = 64) -> DataFrame:
    """Union N per-snapshot KMV tables and re-take the bottom-k per
    key: commutative, associative, duplicate-insensitive — re-seen
    values hash identically and collapse. Pure array arithmetic over
    k-sized blobs (explode + the same bounded machinery would also
    work; arrays avoid any shuffle beyond the key groupBy)."""
    u = sketches[0]
    for t in sketches[1:]:
        u = u.unionByName(t)
    zipped = F.arrays_zip(F.col("hashes"), F.col("members"))
    merged = (
        u.select(*key_cols, F.explode(zipped).alias("_p"))
        .select(*key_cols, F.col("_p.hashes").alias("_h"),
                F.col("_p.members").alias("_v"))
        .distinct()
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_h").asc(), F.col("_v").asc())
    bottom = merged.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") <= k)
    return (
        bottom.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(F.struct("_h", "_v")))
             .alias("_pairs"))
        .select(
            *key_cols,
            F.transform(F.col("_pairs"), lambda p: p["_h"])
            .alias("hashes"),
            F.transform(F.col("_pairs"), lambda p: p["_v"])
            .alias("members"))
    )


def _kmv_est_col(hashes, k: int):
    """THE KMV estimator expression, shared by every consumer
    (kmv_estimate, kmv_set_estimates' three sites): exact count below
    k (the small-set regime), else (k-1)/u_k with u_k the k-th
    smallest hash mapped to (0,1), rounded 6dp — one definition so a
    future estimator change (bias correction, rounding) cannot
    silently diverge the operators from each other or from the DuckDB
    oracles."""
    n = F.size(hashes)
    u_k = F.element_at(hashes, k) / F.lit(KMV_HASH_SPACE)
    return F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / u_k, 6))


def kmv_estimate(sketch: DataFrame, key_cols: list[str],
                 k: int = 64) -> DataFrame:
    """Distinct-count estimates from a KMV table: if the sketch holds
    fewer than ``k`` hashes the count is EXACT (the group had <= k
    distinct members — the small-key regime, like HLL's coupon mode);
    otherwise n_hat = (k-1) / u_k with u_k the k-th smallest hash
    mapped to (0,1). One per-row expression, no exchange; rounded
    6dp."""
    return sketch.select(
        *key_cols,
        _kmv_est_col(F.col("hashes"), k).alias("distinct_est"),
        F.size(F.col("hashes")).alias("sample_size"))


# ---------------------------------------------------------------------------
# Decimal log-histogram: mergeable quantile sketches
# ---------------------------------------------------------------------------

HIST_DIGITS = 2     # leading decimal digits kept exactly -> <=5% rel. err
HIST_SCALE = 100    # fixed-point factor: 2 decimal places of the input


def _hist_bucket_cols(val, digits: int, scale: int):
    """(sign, lo, hi) decimal log-bucket of ``val`` — ALL integer/string
    arithmetic, so Spark and DuckDB agree bit-for-bit (the reason this
    sketch uses decimal leading-digit buckets instead of DDSketch's
    log-gamma bins: no transcendental functions anywhere)."""
    v = F.round(val * F.lit(scale), 0).cast("long")
    sign = F.when(v < 0, F.lit(-1)).when(v > 0, F.lit(1)).otherwise(
        F.lit(0)).cast("int")
    a = F.abs(v)
    astr = a.cast("string")
    ln = F.length(astr)
    small = ln <= digits
    m = F.pow(F.lit(10.0), (ln - digits).cast("double")).cast("long")
    d = F.substring(astr, 1, digits).cast("long")
    lo = F.when(small, a).otherwise(d * m)
    hi = F.when(small, a + 1).otherwise((d + 1) * m)
    return sign, lo, hi


def hist_build(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    digits: int = HIST_DIGITS,
    scale: int = HIST_SCALE,
) -> DataFrame:
    """Mergeable quantile-histogram sketch per key:
    ``(*key_cols, sign, lo, hi, cnt)``.

    The bucket family is HdrHistogram's exponent+linear-subbucket idea
    (Tene, public-domain HdrHistogram) in base 10: values are fixed-
    pointed (``round(v*scale)`` -> long), then bucketed by their first
    ``digits`` decimal digits — magnitudes below 10^digits get EXACT
    unit buckets, larger magnitudes share a bucket with every value
    agreeing on the leading ``digits`` digits. Like DDSketch (Masson,
    Rim & Lee, VLDB'19) this gives a RELATIVE-error guarantee —
    <= 0.5*10^(1-digits) of the true value (5% at digits=2, 0.5% at 3)
    — but with zero floating-point in the bucket function, so the
    DuckDB oracle replays the sketch bit-for-bit (log-gamma bins would
    hinge on ulp-level ``ln`` agreement across engines).

    Scale shape: one map-side-partial groupBy; per key the sketch is
    BOUNDED — at most ~90 buckets per decade of range plus 10^digits
    exact unit buckets, independent of row count — so per-snapshot
    sketches of a 10^10-row table are a few-hundred-rows-per-key
    summary, and every later quantile question is metadata-cheap.
    Negative values mirror into sign=-1 buckets; zero is its own
    bucket."""
    sign, lo, hi = _hist_bucket_cols(F.col(val_col), digits, scale)
    return (
        df.select(*key_cols, sign.alias("sign"), lo.alias("lo"),
                  hi.alias("hi"))
        .groupBy(*key_cols, "sign", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge per-snapshot histogram sketches by bucket-count addition —
    commutative/associative (like the HLL register-max and CMS cell-sum
    merges above), so snapshot arrival order cannot change any
    estimate. GroupBy over already-tiny bucket rows."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy(*key_cols, "sign", "lo", "hi").agg(
        F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    key_cols: list[str],
    qs: list[float],
    scale: int = HIST_SCALE,
) -> DataFrame:
    """Quantile estimates from a (merged) histogram sketch:
    ``(*key_cols, q, est, n)`` — ``est`` is the midpoint of the first
    bucket whose cumulative count reaches ``ceil(q*n)`` walking buckets
    in value order, rounded 6dp; ``n`` is the key's total count.

    The cumulative walk is a window over the sketch's bounded bucket
    rows PARTITIONED BY the key (never partition-less — plan-audit
    rule), so the cost is per-key-sketch-sized, not data-sized. The
    signed integer midpoint ``sign*(lo+hi)`` is computed before the
    single float division, keeping the oracle replay exact."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("rep2x")
    wall = Window.partitionBy(*key_cols)
    b = (
        sketch
        .withColumn("rep2x", F.col("sign") * (F.col("lo") + F.col("hi")))
        .withColumn("cum", F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", F.sum("cnt").over(wall))
    )
    qlit = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    hits = (
        b.select(*key_cols, "rep2x", "cum", "n", qlit)
        .filter(F.col("cum") >=
                F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)))
    )
    return (
        hits.groupBy(*key_cols, "q")
        .agg(F.min("rep2x").alias("_r"), F.first("n").alias("n"))
        .select(
            *key_cols, "q",
            F.round(F.col("_r") / F.lit(2.0 * scale), 6).alias("est"),
            "n")
    )


def kmv_set_estimates(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Set-operation cardinalities across two KMV sketch tables — the
    question HLL cannot answer: per key, the estimated Jaccard,
    INTERSECTION and union sizes of the two underlying distinct-value
    sets, computed from the two k-sized blobs alone ("how many URLs do
    crawl A and crawl B share?" without joining 10^10-row sets).

    Method (Beyer et al. SIGMOD'07 / the standard KMV algebra): the
    union's bottom-k is the bottom-k of the merged hash sets (min-hash
    closure); Jaccard is the fraction of those union-bottom-k members
    present in BOTH sketches (each is an unbiased uniform sample of
    the union); intersection = jaccard * union_est.

    Output: ``(*key_cols, a_est, b_est, union_est, jaccard,
    intersection_est, sample_union)`` — estimates 6dp, exact in the
    small regime (union < k). Everything is per-row array arithmetic
    over <=2k elements after one equi-join of the two sketch tables —
    no explode, no corpus."""
    za = F.arrays_zip(F.col("_a.hashes").alias("h"),
                      F.col("_a.members").alias("m"))
    zb = F.arrays_zip(F.col("_b.hashes").alias("h"),
                      F.col("_b.members").alias("m"))
    cz = F.slice(
        F.array_sort(F.array_distinct(F.concat(za, zb))), 1, k)
    n_union = F.size(cz)
    union_est = _kmv_est_col(F.transform(cz, lambda p: p["h"]), k)

    def est_of(side):
        return _kmv_est_col(F.col(f"_{side}.hashes"), k)

    in_both = F.size(F.filter(
        cz,
        lambda p: F.array_contains(F.col("_a.members"), p["m"])
        & F.array_contains(F.col("_b.members"), p["m"])))
    jac = F.round(in_both.cast("double")
                  / F.greatest(n_union, F.lit(1)), 6)
    joined = (
        a.select(*key_cols, F.struct("hashes", "members").alias("_a"))
        .join(b.select(*key_cols,
                       F.struct("hashes", "members").alias("_b")),
              key_cols)
    )
    return joined.select(
        *key_cols,
        est_of("a").alias("a_est"),
        est_of("b").alias("b_est"),
        union_est.alias("union_est"),
        jac.alias("jaccard"),
        F.round(jac * union_est, 6).alias("intersection_est"),
        n_union.alias("sample_union"),
    )
