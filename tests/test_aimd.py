"""AIMD politeness controller: exact fold replay vs Python, cap/floor
clamps, the recent-k state bound, and equal-ts tie-breaking."""

from __future__ import annotations

import random

import pytest

from commoncrawl_spark.operators.schedule import aimd_host_rates


def _aimd_py(outcomes, init=1.0, add=0.25, beta=0.5,
             lo=0.125, hi=8.0, recent_k=512):
    rate = init
    for ok in outcomes[-recent_k:]:
        rate = min(rate + add, hi) if ok else max(rate * beta, lo)
    return rate


@pytest.mark.spark
def test_fold_matches_python_bit_exact(spark):
    rng = random.Random(3)
    rows, want = [], {}
    for h in range(6):
        outs = [rng.random() > 0.3 for _ in range(rng.randrange(1, 40))]
        want[f"h{h}.test"] = _aimd_py(outs)
        rows += [(f"h{h}.test", i, ok) for i, ok in enumerate(outs)]
    df = spark.createDataFrame(rows, "host string, ts long, ok boolean")
    got = {r["host"]: r for r in aimd_host_rates(df).collect()}
    for h, rate in want.items():
        assert got[h]["rate"] == rate  # exact binary fractions: == not approx
    assert got["h0.test"]["n_events"] == len(
        [r for r in rows if r[0] == "h0.test"])


@pytest.mark.spark
def test_cap_and_floor(spark):
    rows = [("up.test", i, True) for i in range(100)]
    rows += [("down.test", i, False) for i in range(100)]
    df = spark.createDataFrame(rows, "host string, ts long, ok boolean")
    got = {r["host"]: r["rate"] for r in aimd_host_rates(df).collect()}
    assert got["up.test"] == 8.0
    assert got["down.test"] == 0.125


@pytest.mark.spark
def test_recent_k_bounds_the_fold(spark):
    """Ancient history must not fold: 1000 failures followed by 8
    successes, recent_k=8 -> the failures never execute and the rate is
    init + 8*add exactly."""
    rows = [("h.test", i, False) for i in range(1000)]
    rows += [("h.test", 1000 + i, True) for i in range(8)]
    df = spark.createDataFrame(rows, "host string, ts long, ok boolean")
    r = aimd_host_rates(df, recent_k=8).collect()[0]
    assert r["rate"] == 1.0 + 8 * 0.25
    assert r["n_failures"] == 1000  # stats still count the full log


@pytest.mark.spark
def test_equal_ts_tiebreak_is_deterministic(spark):
    """Two events at the same ts in opposite orders across partitions:
    the tiebreak column pins the fold order (failure then success vs
    success then failure give different rates)."""
    rows = [("h.test", 5, 1, False), ("h.test", 5, 0, True)]
    df = spark.createDataFrame(
        rows, "host string, ts long, seq int, ok boolean")
    r1 = aimd_host_rates(df, tiebreak_cols=("seq",)).collect()[0]["rate"]
    r2 = aimd_host_rates(df.repartition(4),
                         tiebreak_cols=("seq",)).collect()[0]["rate"]
    # ok(seq=0) first: 1.25 -> fail halves: 0.625
    assert r1 == r2 == 0.625
