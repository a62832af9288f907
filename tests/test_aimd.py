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


@pytest.mark.spark
def test_fetch_timetable_spacing_and_default(spark):
    from commoncrawl_spark.operators.schedule import fetch_timetable

    batch = spark.createDataFrame(
        [("fast.test", f"https://fast.test/{i}") for i in range(3)]
        + [("norate.test", "https://norate.test/a")],
        "host string, url string")
    rates = spark.createDataFrame(
        [("fast.test", 4.0)], "host string, rate double")
    got = {r["url"]: r for r in fetch_timetable(
        batch, rates, round_start=100.0).collect()}
    assert [got[f"https://fast.test/{i}"]["fetch_at"] for i in range(3)] \
        == [100.0, 100.25, 100.5]
    assert got["https://norate.test/a"]["fetch_at"] == 100.0
    assert got["https://fast.test/2"]["host_seq"] == 2


@pytest.mark.spark
def test_fetch_timetable_deterministic_replan(spark):
    from commoncrawl_spark.operators.schedule import fetch_timetable

    rows = [("h.test", f"https://h.test/{c}") for c in "dacb"]
    batch = spark.createDataFrame(rows, "host string, url string")
    rates = spark.createDataFrame([("h.test", 2.0)],
                                  "host string, rate double")
    t1 = sorted(map(tuple, fetch_timetable(batch, rates).collect()))
    t2 = sorted(map(tuple, fetch_timetable(
        batch.repartition(5), rates).collect()))
    assert t1 == t2
    by_url = {u: t for _, u, _, t in t1}
    # priority order is the url sort: a fires first
    assert by_url["https://h.test/a"] == 0.0
    assert by_url["https://h.test/d"] == 1.5


def _ring_py(hosts, n_shards, vnodes=64, salt="ring"):
    import hashlib

    def u32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ring = sorted(
        (u32(f"{salt}-{s}-{v}"), s)
        for s in range(n_shards) for v in range(vnodes))
    out = {}
    for h in hosts:
        hp = u32(h)
        nxt = [e for e in ring if e[0] >= hp]
        out[h] = (nxt[0] if nxt else ring[0])[1]
    return out


@pytest.mark.spark
def test_consistent_shards_match_python_ring(spark):
    from commoncrawl_spark.operators.schedule import consistent_host_shards

    hosts = [f"h{i}.test" for i in range(60)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["shard"]
           for r in consistent_host_shards(df, 5, vnodes=16).collect()}
    assert got == _ring_py(hosts, 5, 16)
    # virtual nodes keep load roughly even: no shard owns half the keys
    from collections import Counter
    assert max(Counter(got.values()).values()) < 30


@pytest.mark.spark
def test_consistent_shards_minimal_movement_on_resize(spark):
    """THE consistent-hashing property: growing 5 -> 6 shards moves
    hosts ONLY onto the new shard 5 — never between survivors."""
    from commoncrawl_spark.operators.schedule import consistent_host_shards

    df = spark.createDataFrame(
        [(f"h{i}.test",) for i in range(200)], "host string")
    a = {r["host"]: r["shard"]
         for r in consistent_host_shards(df, 5, vnodes=16).collect()}
    b = {r["host"]: r["shard"]
         for r in consistent_host_shards(df, 6, vnodes=16).collect()}
    moved = {h for h in a if a[h] != b[h]}
    assert all(b[h] == 5 for h in moved)
    assert 0 < len(moved) < 100  # some arc stolen, far from a reshuffle


@pytest.mark.spark
def test_explore_exploit_budget_split(spark):
    import hashlib

    from commoncrawl_spark.operators.schedule import explore_exploit_budget

    hosts = spark.createDataFrame(
        [("big.test", 30.0, True), ("mid.test", 10.0, True),
         ("dead.test", 0.0, True),
         ("new1.test", None, False), ("new2.test", None, False),
         ("new3.test", None, False)],
        "host string, score double, known boolean")
    got = {r["host"]: r["quota"] for r in explore_exploit_budget(
        hosts, total_budget=100, epsilon=0.2).collect()}
    # exploit pot 80 split 30:10 -> 60/20; zero-score earns nothing
    assert got["big.test"] == 60 and got["mid.test"] == 20
    assert got["dead.test"] == 0
    # explore pot 20 over 3 new hosts: floor 6 each + 2 remainder to
    # the md5-smallest hosts
    news = ["new1.test", "new2.test", "new3.test"]
    bonus = sorted(news, key=lambda h: hashlib.md5(h.encode()).hexdigest())[:2]
    for h in news:
        assert got[h] == 6 + (1 if h in bonus else 0)
    assert sum(got[h] for h in news) == 20
    # determinism across partitionings
    again = {r["host"]: r["quota"] for r in explore_exploit_budget(
        hosts.repartition(5), total_budget=100, epsilon=0.2).collect()}
    assert again == got


@pytest.mark.spark
def test_explore_exploit_edge_cases(spark):
    from commoncrawl_spark.operators.schedule import explore_exploit_budget

    # no new hosts: whole exploit pot still allocates, explore pot idles
    known_only = spark.createDataFrame(
        [("a.test", 1.0, True)], "host string, score double, known boolean")
    got = {r["host"]: r["quota"] for r in explore_exploit_budget(
        known_only, 10, epsilon=0.5).collect()}
    assert got["a.test"] == 5
    # epsilon=1: pure exploration
    new_only = spark.createDataFrame(
        [("n1.test", None, False), ("n2.test", None, False)],
        "host string, score double, known boolean")
    got = {r["host"]: r["quota"] for r in explore_exploit_budget(
        new_only, 7, epsilon=1.0).collect()}
    assert sorted(got.values()) == [3, 4]


# ---------------------------------------------------------------------------
# per-IP politeness
# ---------------------------------------------------------------------------

def _ip_frontier(spark, n_hosts=9, urls_per_host=5):
    from pyspark.sql import Row
    rows = [Row(host=f"h{h}.ip.test",
                url=f"https://h{h}.ip.test/p{u}")
            for h in range(n_hosts) for u in range(urls_per_host)]
    return spark.createDataFrame(rows)


def test_cohosted_hosts_share_one_ip_budget(spark):
    from commoncrawl_spark.operators.schedule import (
        resolve_host_ips, select_ip_polite_batch)
    f = _ip_frontier(spark)
    ips = resolve_host_ips(f, n_ips=2)  # 9 hosts -> 2 ips: forced co-hosting
    out = select_ip_polite_batch(f, ips, budget_per_ip=4)
    per_ip = {r["ip"]: r["cnt"] for r in
              out.groupBy("ip").count().withColumnRenamed(
                  "count", "cnt").collect()}
    assert all(v <= 4 for v in per_ip.values())
    # total fetches bounded by ips*budget even though hosts*urls = 45
    assert out.count() <= 2 * 4


def test_round_robin_fairness_across_vhosts(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.schedule import select_ip_polite_batch
    f = _ip_frontier(spark, n_hosts=3, urls_per_host=10)
    ips = f.sparkSession.createDataFrame(
        [Row(host=f"h{h}.ip.test", ip="10.0.0.1") for h in range(3)])
    out = select_ip_polite_batch(f, ips, budget_per_ip=4)
    counts = sorted(r["cnt"] for r in out.groupBy("host").count()
                    .withColumnRenamed("count", "cnt").collect())
    # 4 slots over 3 vhosts -> (1,1,2), never (4,0,0)
    assert counts == [1, 1, 2]
    # and the slots are each host's head-of-line URLs in priority order
    first = out.filter(out.ip_rank <= 3)
    assert all(r["host_rank"] == 1 for r in first.collect())


def test_salted_two_stage_is_exact(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.schedule import select_ip_polite_batch
    f = _ip_frontier(spark, n_hosts=7, urls_per_host=6)
    ips = f.sparkSession.createDataFrame(
        [Row(host=f"h{h}.ip.test", ip=f"10.0.0.{h % 2}")
         for h in range(7)])
    a = select_ip_polite_batch(f, ips, budget_per_ip=5, salt_buckets=8)
    b = select_ip_polite_batch(f, ips, budget_per_ip=5, salt_buckets=1)
    ka = sorted((r["ip"], r["url"], r["ip_rank"]) for r in a.collect())
    kb = sorted((r["ip"], r["url"], r["ip_rank"]) for r in b.collect())
    assert ka == kb


def test_unresolvable_hosts_dropped_and_join_broadcast(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.schedule import select_ip_polite_batch
    f = _ip_frontier(spark, n_hosts=4)
    ips = f.sparkSession.createDataFrame(
        [Row(host="h0.ip.test", ip="10.0.0.1")])
    out = select_ip_polite_batch(f, ips, budget_per_ip=10)
    hosts = {r["host"] for r in out.select("host").distinct().collect()}
    assert hosts == {"h0.ip.test"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import sys
    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    from scripts.plan_audit import partitionless_windows
    assert partitionless_windows(plan) == []


def test_resolver_default_is_md5_deterministic(spark):
    from commoncrawl_spark.operators.schedule import resolve_host_ips
    import hashlib
    f = _ip_frontier(spark, n_hosts=5, urls_per_host=1)
    got = {r["host"]: r["ip"] for r in
           resolve_host_ips(f, n_ips=16).collect()}
    for h, ip in got.items():
        idx = int(hashlib.md5(h.encode()).hexdigest()[:8], 16) % 16
        assert ip == f"10.0.{idx // 256}.{idx % 256}"
