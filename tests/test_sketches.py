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
