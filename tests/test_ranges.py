"""Binned range-lookup join: containment, overlap rule, plan shape."""

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.ranges import range_lookup_join


@pytest.mark.spark
def test_range_join_containment_and_left_nulls(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 25), (3, 105), (4, 999)], "id long, v long")
    rng = spark.createDataFrame(
        [(0, 9, "A"), (10, 99, "B"), (100, 199, "C")],
        "lo long, hi long, asn string")
    got = {r["id"]: r["range_asn"]
           for r in range_lookup_join(pts, rng, "v").collect()}
    assert got == {1: "A", 2: "B", 3: "C", 4: None}


@pytest.mark.spark
def test_range_join_bounds_inclusive_both_ends(spark):
    pts = spark.createDataFrame([(1, 10), (2, 99), (3, 100)], "id long, v long")
    rng = spark.createDataFrame([(10, 99, "B")], "lo long, hi long, asn string")
    got = {r["id"]: r["range_asn"]
           for r in range_lookup_join(pts, rng, "v", bin_width=7).collect()}
    assert got == {1: "B", 2: "B", 3: None}


@pytest.mark.spark
def test_range_join_overlap_picks_narrowest_then_lowest(spark):
    """14 sits in [10,99], [12,15] and [12,15]-width twin [13,16]:
    narrowest wins; among equal widths the smaller lo wins."""
    pts = spark.createDataFrame([(1, 14)], "id long, v long")
    rng = spark.createDataFrame(
        [(10, 99, "wide"), (12, 15, "narrow_lo"), (13, 16, "narrow_hi")],
        "lo long, hi long, asn string")
    row = range_lookup_join(pts, rng, "v").collect()[0]
    assert row["range_asn"] == "narrow_lo"


@pytest.mark.spark
def test_range_join_inner_drops_unmatched(spark):
    pts = spark.createDataFrame([(1, 5), (2, 500)], "id long, v long")
    rng = spark.createDataFrame([(0, 9, "A")], "lo long, hi long, asn string")
    out = range_lookup_join(pts, rng, "v", how="inner")
    assert [r["id"] for r in out.collect()] == [1]
    with pytest.raises(ValueError, match="how"):
        range_lookup_join(pts, rng, "v", how="outer")


@pytest.mark.spark
def test_range_join_plan_equi_join_only(spark):
    """The whole point: no BroadcastNestedLoopJoin / CartesianProduct —
    the containment predicate rides a bin equi-join."""
    pts = spark.createDataFrame(
        [(i, i * 3) for i in range(100)], "id long, v long")
    rng = spark.createDataFrame(
        [(i * 10, i * 10 + 9, f"r{i}") for i in range(30)],
        "lo long, hi long, asn string")
    out = range_lookup_join(pts, rng, "v")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Window" not in plan  # overlap winner is min_by, not a rank
