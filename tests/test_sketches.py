"""Mergeable HLL cardinality sketches: merge invariance, the exact
coupon regime the driver oracle leans on, the estimation-regime
tolerance at 200k distinct, and the partial-aggregate plan shape."""

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.sketches import (
    build_sketches,
    estimate_cardinality,
    merge_sketches,
)


@pytest.mark.spark
def test_merge_halves_equals_whole(spark):
    # splitting into snapshots and merging must give the same estimate
    # as sketching the whole — register-max merging is order-insensitive
    df = spark.range(2100).select(
        (F.col("id") % 7).alias("k"), F.floor(F.col("id") / 7).alias("v"))
    whole = {r["k"]: r["distinct_est"] for r in estimate_cardinality(
        build_sketches(df, ["k"], "v"), ["k"]).collect()}
    a = build_sketches(df.filter(F.col("id") % 2 == 0), ["k"], "v")
    b = build_sketches(
        df.filter(F.col("id") % 2 == 1).repartition(13), ["k"], "v")
    merged = {r["k"]: r["distinct_est"] for r in estimate_cardinality(
        merge_sketches(a, b, key_cols=["k"]), ["k"]).collect()}
    assert merged == whole      # 300 distinct/key: coupon regime, exact
    # estimation regime: merged tracks the directly-built estimate to 5%
    big = spark.range(200_000).select(
        F.lit(1).alias("k"), F.col("id").alias("v"))
    w = estimate_cardinality(
        build_sketches(big, ["k"], "v"), ["k"]).first()["distinct_est"]
    m = estimate_cardinality(
        merge_sketches(
            build_sketches(big.filter(F.col("v") % 2 == 0), ["k"], "v"),
            build_sketches(big.filter(F.col("v") % 2 == 1), ["k"], "v"),
            key_cols=["k"]),
        ["k"]).first()["distinct_est"]
    assert abs(m - w) / w < 0.05


@pytest.mark.spark
def test_exact_coupon_regime(spark):
    # small cardinalities: the sketch answers exactly — the regime the
    # driver query's count(DISTINCT) oracle relies on
    df = spark.range(1200).select(
        (F.col("id") % 4).alias("k"), F.floor(F.col("id") / 4).alias("v"))
    got = estimate_cardinality(
        build_sketches(df, ["k"], "v"), ["k"]).collect()
    for r in got:
        assert r["distinct_est"] == 300 and r["n_rows"] == 300


@pytest.mark.spark
def test_estimation_regime_tolerance(spark):
    # 200k distinct values blow past the coupon regime; lgk=12 gives
    # ~1.6% RSE — pin a 5% (3-sigma) band so a packaging regression
    # (wrong lgk, wrong column) fails loudly
    df = spark.range(200_000).select(F.lit(1).alias("k"),
                                     F.col("id").alias("v"))
    est = estimate_cardinality(
        build_sketches(df, ["k"], "v"), ["k"]).first()["distinct_est"]
    assert abs(est - 200_000) / 200_000 < 0.05
    # deterministic: same input -> bit-identical sketch -> same estimate
    est2 = estimate_cardinality(
        build_sketches(df.repartition(17), ["k"], "v"),
        ["k"]).first()["distinct_est"]
    assert est2 == est


@pytest.mark.spark
def test_dup_values_across_snapshots_not_double_counted(spark):
    a = spark.createDataFrame(
        [("h", i) for i in range(100)], "k string, v long")
    b = spark.createDataFrame(
        [("h", i) for i in range(50, 150)], "k string, v long")
    m = estimate_cardinality(
        merge_sketches(build_sketches(a, ["k"], "v"),
                       build_sketches(b, ["k"], "v"), key_cols=["k"]),
        ["k"]).first()
    assert m["distinct_est"] == 150      # union, not 200
    assert m["n_rows"] == 200            # raw rows do sum


@pytest.mark.spark
def test_mixed_lgk_merge_needs_flag(spark):
    df = spark.createDataFrame([("h", 1)], "k string, v long")
    a = build_sketches(df, ["k"], "v", lgk=12)
    b = build_sketches(df, ["k"], "v", lgk=13)
    with pytest.raises(Exception):
        merge_sketches(a, b, key_cols=["k"]).collect()
    est = estimate_cardinality(
        merge_sketches(a, b, key_cols=["k"], allow_different_lgk=True),
        ["k"]).first()["distinct_est"]
    assert est == 1


@pytest.mark.spark
def test_sketch_plan_partial_agg_no_python(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    out = build_sketches(df, ["k"], "v")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "partial_hll_sketch_agg" in plan   # map-side partial sketching


@pytest.mark.spark
def test_cms_never_undercounts_and_wide_is_exact(spark):
    """CMS point estimates are >= truth always; with width >> distinct
    keys and 4 independent rows, min-over-rows recovers exact counts."""
    from commoncrawl_spark.operators.sketches import cms_build, cms_estimate

    rows = [(f"k{i % 7}",) for i in range(70)] + [("whale",)] * 30
    df = spark.createDataFrame(rows, "key string")
    truth = {f"k{i}": 10 for i in range(7)} | {"whale": 30}
    sk = cms_build(df, "key", depth=4, width=1024)
    probes = df.select("key").distinct()
    est = {r["key"]: r["est"]
           for r in cms_estimate(sk, probes, "key", depth=4,
                                 width=1024).collect()}
    assert all(est[k] >= v for k, v in truth.items())
    assert est == truth  # wide sketch, no collisions survive 4 rows


@pytest.mark.spark
def test_cms_merge_equals_union_sketch(spark):
    """Mergeability: sketch(A) + sketch(B) cellwise == sketch(A ∪ B) —
    the property that makes per-snapshot summaries history-free."""
    from commoncrawl_spark.operators.sketches import cms_build, cms_merge

    a = spark.createDataFrame([(f"k{i % 5}",) for i in range(40)], "key string")
    b = spark.createDataFrame([(f"k{i % 9}",) for i in range(33)], "key string")
    merged = {(r["d"], r["bucket"]): r["count"]
              for r in cms_merge(cms_build(a, "key", 3, 64),
                                 cms_build(b, "key", 3, 64)).collect()}
    whole = {(r["d"], r["bucket"]): r["count"]
             for r in cms_build(a.unionByName(b), "key", 3, 64).collect()}
    assert merged == whole


@pytest.mark.spark
def test_cms_unseen_key_reads_zero_or_collision(spark):
    from commoncrawl_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "key string")
    sk = cms_build(df, "key", depth=4, width=2048)
    probes = spark.createDataFrame([("never",)], "key string")
    est = cms_estimate(sk, probes, "key", depth=4, width=2048).collect()
    assert est[0]["est"] == 0  # wide enough that no row collides
    with pytest.raises(ValueError, match="depth/width"):
        cms_build(df, "key", depth=0)


@pytest.mark.spark
def test_cms_plan_broadcast_probe_no_python(spark):
    from commoncrawl_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([(f"k{i % 11}",) for i in range(99)],
                               "key string")
    sk = cms_build(df, "key", depth=2, width=32)
    out = cms_estimate(sk, df.distinct(), "key", depth=2, width=32)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the matrix side is broadcast
    assert "EvalPython" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_misra_gries_guarantee_and_bounds():
    from collections import Counter

    from commoncrawl_spark.operators.sketches import misra_gries_py

    # adversarial stream: 3 heavy items among a churn of singletons
    stream = (["a"] * 400 + ["b"] * 300 + ["c"] * 200
              + [f"x{i}" for i in range(600)])
    true = Counter(stream)
    n = len(stream)
    for m in (3, 5, 20):
        kept = misra_gries_py(iter(stream), m)
        assert len(kept) <= m
        # every item with count > n/(m+1) must survive
        for item, c in true.items():
            if c > n / (m + 1):
                assert item in kept, (item, m)
        # kept bounds never overcount and undercount by <= n/(m+1)
        for item, lb in kept.items():
            assert lb <= true[item]
            assert true[item] - lb <= n / (m + 1)
    with pytest.raises(ValueError):
        misra_gries_py(iter(stream), 0)


@pytest.mark.spark
def test_heavy_hitters_exact_and_partition_invariant(spark):
    from commoncrawl_spark.operators.sketches import heavy_hitters

    # 2 heavy tokens + a 200-token tail spread over docs
    rows = [(i, ["hot"] * 5 + ["warm"] * 2 + [f"t{i % 200}"])
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    n = 400 * 8
    # k=10 -> threshold n/k=320: hot (2000) and warm (800) only
    want = [("hot", 2000, round(2000 / n, 6)),
            ("warm", 800, round(800 / n, 6))]
    for parts in (1, 7, 32):
        got = [(r["token"], r["cnt"], r["share"])
               for r in heavy_hitters(
                   df.repartition(parts), "tokens", k=10).collect()]
        assert got == want, parts


@pytest.mark.spark
def test_heavy_hitters_edge_cases(spark):
    from commoncrawl_spark.operators.sketches import heavy_hitters

    # null and empty arrays don't crash and don't count toward n
    df = spark.createDataFrame(
        [(0, ["a", "a", "b"]), (1, None), (2, [])],
        "doc_id long, tokens array<string>")
    got = [(r["token"], r["cnt"]) for r in
           heavy_hitters(df, "tokens", k=2).collect()]
    assert got == [("a", 2)]       # b: 1*2 < 3
    with pytest.raises(ValueError):
        heavy_hitters(df, "tokens", k=0)


@pytest.mark.spark
def test_heavy_hitters_plan_broadcast_semi_no_global_window(spark):
    from commoncrawl_spark.operators.sketches import heavy_hitters
    from commoncrawl_spark.plans.explain import plan_string

    df = spark.createDataFrame(
        [(i, ["w", f"t{i}"]) for i in range(50)],
        "doc_id long, tokens array<string>")
    p = plan_string(heavy_hitters(df, "tokens", k=5), "simple")
    # candidate probe broadcasts; the only Python site is the MG pass
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert p.count("MapInPandas") == 1 and "EvalPython" not in p
    assert "Window" not in p


# ---------------------------------------------------------------------------
# KMV / bottom-k sketches
# ---------------------------------------------------------------------------

def _kmv_hash(v: str) -> int:
    import hashlib
    return int(hashlib.md5(v.encode()).hexdigest()[:8], 16)


@pytest.mark.spark
def test_kmv_build_exact_small_and_merge_equals_whole(spark):
    from commoncrawl_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("k"),
        ((F.col("id") * 7) % 500).alias("v"))
    whole = kmv_build(df, ["k"], "v", k=64)
    # small regime: each key has <= 500 distinct; with k=64 the
    # estimate is the KMV formula — but a key with < 64 distinct is
    # exact. Build a tiny group to check exactness:
    tiny = spark.createDataFrame(
        [(9, i % 5) for i in range(50)], "k long, v long")
    t = kmv_estimate(kmv_build(tiny, ["k"], "v", k=64), ["k"], k=64)
    assert t.collect()[0]["distinct_est"] == 5.0
    # merge of halves == sketch of whole (order/dup insensitivity)
    a = kmv_build(df.filter(F.col("id") % 2 == 0), ["k"], "v", k=64)
    b = kmv_build(df.filter(F.col("id") % 2 == 1).repartition(7),
                  ["k"], "v", k=64)
    m = kmv_merge(a, b, key_cols=["k"], k=64)
    got_w = {r["k"]: (r["hashes"], r["members"])
             for r in whole.collect()}
    got_m = {r["k"]: (r["hashes"], r["members"]) for r in m.collect()}
    assert got_w == got_m


@pytest.mark.spark
def test_kmv_bottom_k_is_truly_bottom_and_estimate_close(spark):
    from commoncrawl_spark.operators.sketches import kmv_build, kmv_estimate

    n = 2000
    df = spark.range(n).select(F.lit(0).alias("k"),
                               F.col("id").alias("v"))
    sk = kmv_build(df, ["k"], "v", k=64)
    [row] = sk.collect()
    want = sorted(_kmv_hash(str(v)) for v in range(n))[:64]
    assert row["hashes"] == want
    [est] = kmv_estimate(sk, ["k"], k=64).collect()
    assert abs(est["distinct_est"] - n) / n < 0.35   # (k-1)/u_k regime
    # members align with hashes
    assert [_kmv_hash(m) for m in row["members"]] == row["hashes"]


@pytest.mark.spark
def test_kmv_plan_keyed_windows_only(spark):
    from commoncrawl_spark.operators.sketches import kmv_build
    from commoncrawl_spark.plans.explain import plan_string

    df = spark.range(100).select((F.col("id") % 2).alias("k"),
                                 F.col("id").alias("v"))
    p = plan_string(kmv_build(df, ["k"], "v", k=8))
    # both windows carry partition specs (the salted two-stage shape)
    from scripts.plan_audit import partitionless_windows
    assert partitionless_windows(p) == []
    assert "EvalPython" not in p


def test_misra_gries_weighted_matches_unit_guarantee():
    import random
    from collections import Counter

    from commoncrawl_spark.operators.sketches import (
        misra_gries_py,
        misra_gries_weighted_py,
    )

    rng = random.Random(7)
    stream = (["a"] * 300 + ["b"] * 150
              + [f"x{rng.randrange(400)}" for _ in range(800)])
    rng.shuffle(stream)
    true = Counter(stream)
    W = len(stream)
    for m in (4, 16):
        # feed pre-aggregated chunks in arbitrary chunking
        chunks = [stream[i:i + 97] for i in range(0, W, 97)]
        pairs = [p for ch in chunks for p in Counter(ch).items()]
        kept = misra_gries_weighted_py(iter(pairs), m)
        assert len(kept) <= m
        for item, c in true.items():
            if c > W / (m + 1):
                assert item in kept, (item, m)
        for item, lb in kept.items():
            assert lb <= true[item]
            assert true[item] - lb <= W / (m + 1)
        # weight-1 pairs degenerate to the unit fold's guarantee too
        unit = misra_gries_py(iter(stream), m)
        for item, c in true.items():
            if c > W / (m + 1):
                assert item in unit
    with pytest.raises(ValueError):
        misra_gries_weighted_py(iter([]), 0)


# ---------------------------------------------------------------------------
# decimal log-histogram quantile sketch
# ---------------------------------------------------------------------------

def _hist_rows(spark, vals, key="k"):
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(k=key, v=float(x)) for x in vals], "k string, v double")


def test_hist_merge_halves_equals_whole(spark):
    from commoncrawl_spark.operators.sketches import hist_build, hist_merge
    vals = [x * 0.37 + (x % 7) for x in range(400)]
    whole = hist_build(_hist_rows(spark, vals), ["k"], "v")
    a = hist_build(_hist_rows(spark, vals[:200]), ["k"], "v")
    b = hist_build(_hist_rows(spark, vals[200:]), ["k"], "v")
    merged = hist_merge(a, b, key_cols=["k"])
    got = {(r["sign"], r["lo"], r["hi"]): r["cnt"] for r in merged.collect()}
    want = {(r["sign"], r["lo"], r["hi"]): r["cnt"] for r in whole.collect()}
    assert got == want


def test_hist_quantile_relative_error_bound(spark):
    # digits=2 guarantees <=5% relative error vs the true quantile.
    import numpy as np
    from commoncrawl_spark.operators.sketches import (
        hist_build, hist_quantiles)
    rng = np.random.RandomState(7)
    vals = list(rng.lognormal(3.0, 1.2, 3000))
    sk = hist_build(_hist_rows(spark, vals), ["k"], "v")
    out = {r["q"]: r["est"]
           for r in hist_quantiles(sk, ["k"], [0.5, 0.9, 0.99]).collect()}
    # exact quantile of the fixed-pointed values (what the sketch sees)
    fp = np.sort(np.round(np.array(vals) * 100).astype(np.int64)) / 100.0
    for q in (0.5, 0.9, 0.99):
        true = fp[int(np.ceil(q * len(fp))) - 1]
        assert abs(out[q] - true) / true <= 0.05, (q, out[q], true)


def test_hist_small_magnitudes_are_exact(spark):
    # |round(v*100)| < 100 -> unit buckets -> exact quantiles
    # (midpoint of [a, a+1) in fixed point is a + 0.005 off).
    from commoncrawl_spark.operators.sketches import (
        hist_build, hist_quantiles)
    vals = [0.01 * i for i in range(1, 100)]  # 0.01 .. 0.99
    sk = hist_build(_hist_rows(spark, vals), ["k"], "v")
    out = {r["q"]: r["est"] for r in
           hist_quantiles(sk, ["k"], [0.5]).collect()}
    assert abs(out[0.5] - 0.50) <= 0.0051


def test_hist_sign_and_zero_buckets(spark):
    from commoncrawl_spark.operators.sketches import (
        hist_build, hist_quantiles)
    vals = [-250.0, -1.0, 0.0, 1.0, 250.0]
    sk = hist_build(_hist_rows(spark, vals), ["k"], "v")
    rows = sk.collect()
    assert {r["sign"] for r in rows} == {-1, 0, 1}
    zero = [r for r in rows if r["sign"] == 0][0]
    assert zero["lo"] == 0 and zero["cnt"] == 1
    med = hist_quantiles(sk, ["k"], [0.5]).collect()[0]
    assert med["est"] == 0.0 and med["n"] == 5  # median of the five is 0


def test_hist_bucket_count_is_bounded(spark):
    # 50k distinct values over 6 decades -> a few hundred buckets max.
    from commoncrawl_spark.operators.sketches import hist_build
    vals = [1.07 ** i % 1e6 for i in range(2000)]
    sk = hist_build(_hist_rows(spark, vals), ["k"], "v")
    assert sk.count() < 700


def test_hist_quantile_windows_are_partitioned(spark):
    from commoncrawl_spark.operators.sketches import (
        hist_build, hist_quantiles)
    sk = hist_build(_hist_rows(spark, [1.0, 2.0, 3.0]), ["k"], "v")
    plan = hist_quantiles(sk, ["k"], [0.5])._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    for m in re.finditer(r"Window \[", plan):
        line = plan[m.start():plan.index("\n", m.start())]
        assert "partitionBy" not in line or True
    # the audit-grade check: no partition-less Window in the plan
    sys_path_hack = "/root/repo"
    import sys
    if sys_path_hack not in sys.path:
        sys.path.insert(0, sys_path_hack)
    from scripts.plan_audit import partitionless_windows
    assert partitionless_windows(plan) == []


# ---------------------------------------------------------------------------
# KMV set-operation estimates
# ---------------------------------------------------------------------------

def test_kmv_set_ops_exact_small_regime(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.sketches import (
        kmv_build, kmv_set_estimates)
    # |A|=6, |B|=5, overlap 3, union 8 — all below k: everything exact
    a_vals = ["u1", "u2", "u3", "u4", "u5", "u6"]
    b_vals = ["u4", "u5", "u6", "u7", "u8"]
    mk = lambda vals: spark.createDataFrame(
        [Row(g="k", v=x) for x in vals])
    a = kmv_build(mk(a_vals), ["g"], "v", k=16)
    b = kmv_build(mk(b_vals), ["g"], "v", k=16)
    r = kmv_set_estimates(a, b, ["g"], k=16).collect()[0]
    assert (r["a_est"], r["b_est"], r["union_est"]) == (6.0, 5.0, 8.0)
    assert r["jaccard"] == 0.375  # 3/8
    assert r["intersection_est"] == 3.0
    assert r["sample_union"] == 8


def test_kmv_set_ops_estimation_regime_tolerance(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.sketches import (
        kmv_build, kmv_set_estimates)
    # 3000-member sets with 1000 shared -> union 5000, J = 0.2
    a_vals = [f"x{i}" for i in range(3000)]
    b_vals = [f"x{i}" for i in range(2000, 5000)]
    mk = lambda vals: spark.createDataFrame(
        [Row(g="k", v=x) for x in vals])
    a = kmv_build(mk(a_vals), ["g"], "v", k=256)
    b = kmv_build(mk(b_vals), ["g"], "v", k=256)
    r = kmv_set_estimates(a, b, ["g"], k=256).collect()[0]
    assert abs(r["union_est"] - 5000) / 5000 < 0.2
    assert abs(r["jaccard"] - 0.2) < 0.08
    assert abs(r["intersection_est"] - 1000) / 1000 < 0.45


def test_kmv_set_ops_disjoint_and_identical(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.sketches import (
        kmv_build, kmv_set_estimates)
    mk = lambda vals: spark.createDataFrame(
        [Row(g="k", v=x) for x in vals])
    a = kmv_build(mk([f"a{i}" for i in range(10)]), ["g"], "v", k=32)
    b = kmv_build(mk([f"b{i}" for i in range(10)]), ["g"], "v", k=32)
    r = kmv_set_estimates(a, b, ["g"], k=32).collect()[0]
    assert r["jaccard"] == 0.0 and r["intersection_est"] == 0.0
    same = kmv_set_estimates(a, a, ["g"], k=32).collect()[0]
    assert same["jaccard"] == 1.0 and same["intersection_est"] == 10.0
