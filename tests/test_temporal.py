"""As-of join and capture time travel: hand-built semantics, inclusive
ties, left-outer nulls, deterministic tiebreaks, and the one-exchange
merge-join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.temporal import asof_join, latest_as_of


@pytest.mark.spark
def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u", 5), (2, "u", 10), (3, "u", 2), (4, "v", 7)],
        "event_id long, user string, ts long")
    right = spark.createDataFrame(
        [("u", 3, 30.0), ("u", 10, 100.0), ("u", 20, 200.0), ("w", 1, 1.0)],
        "user string, ts long, value double")
    got = {r["event_id"]: (r["asof_ts"], r["asof_value"])
           for r in asof_join(left, right, on="user").collect()}
    assert got[1] == (3, 30.0)      # latest <= 5 is ts=3
    assert got[2] == (10, 100.0)    # inclusive: equal ts matches
    assert got[3] == (None, None)   # earliest right row is ts=3 > 2
    assert got[4] == (None, None)   # key with no right rows at all


@pytest.mark.spark
def test_asof_join_equal_ts_tiebreak_deterministic(spark):
    """Two right rows at the identical (key, ts): the struct-max payload
    wins, every run."""
    left = spark.createDataFrame([(1, "u", 5)], "event_id long, user string, ts long")
    right = spark.createDataFrame(
        [("u", 5, 1.0), ("u", 5, 9.0)], "user string, ts long, value double")
    for _ in range(3):
        row = asof_join(left, right, on="user").first()
        assert (row["asof_ts"], row["asof_value"]) == (5, 9.0)


@pytest.mark.spark
def test_asof_join_plan_shape(spark):
    """Union-merge: a single hash exchange on the key drives the window;
    no cartesian, no Python."""
    left = spark.createDataFrame([(1, "u", 5)], "event_id long, user string, ts long")
    right = spark.createDataFrame([("u", 3, 1.0)], "user string, ts long, value double")
    plan = asof_join(left, right, on="user")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # pre-agg + window


@pytest.mark.spark
def test_latest_as_of(spark):
    caps = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("a", "2024-02-01", 2), ("a", "2024-03-01", 3),
         ("b", "2024-05-01", 4)],
        "url string, timestamp string, cap_id long")
    got = {r["url"]: r["cap_id"]
           for r in latest_as_of(caps, "2024-02-15", tiebreak_cols=("cap_id",))
           .collect()}
    assert got == {"a": 2}  # b didn't exist yet; a's March capture too new


@pytest.mark.spark
def test_latest_as_of_tiebreak(spark):
    caps = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("a", "2024-01-01", 7)],
        "url string, timestamp string, cap_id long")
    for _ in range(3):
        row = latest_as_of(caps, "2024-12-31", tiebreak_cols=("cap_id",)).first()
        assert row["cap_id"] == 7


@pytest.mark.spark
def test_sessionize_long_ts(spark):
    """Gap cut on integer seconds: > gap starts a new session, == gap
    does not; ordinals restart per key."""
    from commoncrawl_spark.operators.temporal import sessionize

    ev = spark.createDataFrame(
        [("u", 0), ("u", 100), ("u", 101), ("u", 500), ("v", 0), ("v", 99)],
        "k string, ts long")
    got = {(r["k"], r["ts"]): r["session_id"]
           for r in sessionize(ev, key_col="k", ts_col="ts",
                               gap_seconds=100).collect()}
    assert got[("u", 0)] == "u#0"
    assert got[("u", 100)] == "u#0"   # delta == gap: same session
    assert got[("u", 101)] == "u#0"
    assert got[("u", 500)] == "u#1"   # 399 > 100: new session
    assert got[("v", 0)] == "v#0"
    assert got[("v", 99)] == "v#0"


@pytest.mark.spark
def test_sessionize_timestamp_microsecond_boundary(spark):
    """A fractional-second gap straddling the threshold must cut at
    microsecond precision, not truncated seconds: 100.000001s > 100s
    opens a new session even though the seconds-cast delta is exactly
    100. Covers both TIMESTAMP and parquet's TIMESTAMP_NTZ."""
    from commoncrawl_spark.operators.temporal import sessionize
    from pyspark.sql import functions as F

    for ts_type in ("timestamp", "timestamp_ntz"):
        ev = spark.createDataFrame(
            [("u", "2024-01-01 00:00:00.000000"),
             ("u", "2024-01-01 00:01:40.000001"),   # +100.000001 s
             ("v", "2024-01-01 00:00:00.000000"),
             ("v", "2024-01-01 00:01:40.000000")],  # +100 s exactly
            "k string, raw string",
        ).select("k", F.col("raw").cast(ts_type).alias("ts"))
        got = {(r["k"], str(r["ts"])): r["session_id"]
               for r in sessionize(ev, key_col="k", ts_col="ts",
                                   gap_seconds=100).collect()}
        by_key = {}
        for (k, _), sid in got.items():
            by_key.setdefault(k, set()).add(sid)
        assert by_key["u"] == {"u#0", "u#1"}, ts_type  # strictly over
        assert by_key["v"] == {"v#0"}, ts_type          # exactly at gap


@pytest.mark.spark
def test_sessionize_plan_shape(spark):
    """One hash exchange on the key drives both windows; no Python in
    the plan."""
    from commoncrawl_spark.operators.temporal import sessionize

    ev = spark.createDataFrame([("u", 0)], "k string, ts long")
    plan = (sessionize(ev, key_col="k", ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.mark.spark
def test_snapshot_diff_classification(spark):
    from commoncrawl_spark.operators.temporal import snapshot_diff

    caps = spark.createDataFrame(
        [("a", 1, "200"), ("a", 5, "404"),   # changed between T=2 and T=6
         ("b", 1, "200"),                    # unchanged
         ("c", 4, "200")],                   # added after T=2
        "url string, ts long, status string")
    got = {r["url"]: (r["change"], r["old_status"], r["new_status"])
           for r in snapshot_diff(
               caps, 2, 6, key_col="url", ts_col="ts",
               compare_cols=("status",)).collect()}
    assert got["a"] == ("changed", "200", "404")
    assert got["b"] == ("unchanged", "200", "200")
    assert got["c"] == ("added", None, "200")


@pytest.mark.spark
def test_snapshot_diff_null_safe_compare(spark):
    """NULL -> value transitions classify as changed, NULL -> NULL as
    unchanged (eqNullSafe, not SQL equals)."""
    from commoncrawl_spark.operators.temporal import snapshot_diff

    caps = spark.createDataFrame(
        [("a", 1, None), ("a", 5, "200"),
         ("b", 1, None), ("b", 5, None)],
        "url string, ts long, status string")
    got = {r["url"]: r["change"] for r in snapshot_diff(
        caps, 2, 6, key_col="url", ts_col="ts",
        compare_cols=("status",)).collect()}
    assert got == {"a": "changed", "b": "unchanged"}


@pytest.mark.spark
def test_change_stats_hand_computed(spark):
    """Three captures, one digest flip, numeric (epoch-seconds) ts:
    the bias-corrected Poisson rate -ln((m-x+.5)/(m+.5))/avg_interval."""
    import math

    from commoncrawl_spark.operators.temporal import capture_change_stats

    day = 86400
    caps = spark.createDataFrame(
        [("a", 0, "x"), ("a", day, "x"), ("a", 2 * day, "y"),
         ("b", 0, "x")],
        "url string, ts long, digest string")
    got = {r["url"]: r for r in capture_change_stats(
        caps, key_col="url", ts_col="ts").collect()}
    a = got["a"]
    assert (a["n_captures"], a["n_changes"]) == (3, 1)
    assert a["change_rate_per_day"] == round(-math.log(1.5 / 2.5) / 1.0, 6)
    # single capture: no interval evidence, rate is null
    assert got["b"]["n_captures"] == 1
    assert got["b"]["change_rate_per_day"] is None


@pytest.mark.spark
def test_change_stats_null_safe_digest(spark):
    """null -> value counts as a change; null -> null does not."""
    from commoncrawl_spark.operators.temporal import capture_change_stats

    caps = spark.createDataFrame(
        [("a", 1, None), ("a", 2, "x"),
         ("b", 1, None), ("b", 2, None)],
        "url string, ts long, digest string")
    got = {r["url"]: r["n_changes"] for r in capture_change_stats(
        caps, key_col="url", ts_col="ts").collect()}
    assert got == {"a": 1, "b": 0}


@pytest.mark.spark
def test_recrawl_schedule_priority(spark):
    """p_changed = 1 - exp(-rate * age) under the Poisson model; keys
    without rate evidence fall back to the default rate."""
    import math

    from commoncrawl_spark.operators.temporal import (
        capture_change_stats,
        recrawl_schedule,
    )

    day = 86400
    caps = spark.createDataFrame(
        [("a", 0, "x"), ("a", day, "x"), ("a", 2 * day, "y"),
         ("b", 2 * day, "x")],
        "url string, ts long, digest string")
    stats = capture_change_stats(caps, key_col="url", ts_col="ts")
    got = {r["url"]: r for r in recrawl_schedule(
        stats, 4 * day, default_rate_per_day=0.25).collect()}
    rate_a = round(-math.log(1.5 / 2.5), 6)
    assert got["a"]["age_days"] == 2.0
    assert got["a"]["p_changed"] == round(1 - math.exp(-rate_a * 2.0), 6)
    # 'b' has one capture: default rate applies
    assert got["b"]["p_changed"] == round(1 - math.exp(-0.25 * 2.0), 6)
    # the hot page outranks the cold default
    assert got["a"]["p_changed"] > got["b"]["p_changed"]


@pytest.mark.spark
def test_change_stats_single_shuffle_plan(spark):
    """The lag window and the per-key aggregate share one hash
    exchange — Spark must reuse the window's partitioning."""
    from commoncrawl_spark.operators.temporal import capture_change_stats

    caps = spark.createDataFrame(
        [("a", 1, "x")], "url string, ts long, digest string")
    plan = (capture_change_stats(caps, key_col="url", ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.mark.spark
def test_crawl_budget_clamps_and_shares(spark):
    """Value-weighted split with every clamp path: a high-value host
    capped by politeness, a tiny host capped by pending count, a
    zero-weight host getting 0, an uncapped (no-delay) host."""
    from commoncrawl_spark.operators.schedule import crawl_budget

    rows = (
        [("big.test", 1.0, 1.0)] * 80        # weight 80, share-bound
        + [("slow.test", 1.0, 1.0)] * 80     # weight 80, delay-capped
        + [("tiny.test", 30.0, 1.0)] * 2     # weight 60, pending-capped
        + [("junk.test", 0.0, 0.0)] * 50     # weight 0
    )
    frontier = spark.createDataFrame(
        rows, "host string, p_changed double, q double")
    robots = spark.createDataFrame(
        [("slow.test", 60.0), ("tiny.test", 1.0), ("junk.test", 0.0)],
        "host string, crawl_delay_s double")
    got = {r["host"]: r for r in crawl_budget(
        frontier, total_budget=100, round_seconds=600.0,
        robots=robots, quality_col="q").collect()}
    # weights: big 80, slow 80, tiny 60, junk 0 -> total 220
    assert got["big.test"]["politeness_cap"] is None
    assert got["big.test"]["quota"] == int(100 * 80 / 220)  # 36, share
    assert got["slow.test"]["politeness_cap"] == 10         # 600/60
    assert got["slow.test"]["quota"] == 10                  # delay clamp
    assert got["tiny.test"]["quota"] == 2   # share 27, pending clamp 2
    assert got["junk.test"]["politeness_cap"] is None       # delay 0 = none
    assert got["junk.test"]["quota"] == 0
    assert got["big.test"]["n_pending"] == 80


@pytest.mark.spark
def test_crawl_budget_feeds_polite_batch(spark):
    """Composition: quotas become select_polite_batch's budget_col —
    each host fetches exactly min(quota, pending) URLs."""
    from commoncrawl_spark.operators.schedule import (
        crawl_budget, select_polite_batch)

    frontier = spark.createDataFrame(
        [(f"https://h{i % 3}.test/p{i}", f"h{i % 3}.test",
          f"k{i:03d}", 1.0) for i in range(30)],
        "url string, host string, url_sha1 string, p_changed double")
    quotas = crawl_budget(frontier, total_budget=9)
    batch = select_polite_batch(
        frontier.join(quotas.select("host", "quota"), "host"),
        budget_per_host=100, priority_cols=("url",),
        budget_col="quota")
    per_host = {r["host"]: r["cnt"] for r in
                batch.groupBy("host").agg(
                    F.count(F.lit(1)).alias("cnt")).collect()}
    assert per_host == {"h0.test": 3, "h1.test": 3, "h2.test": 3}


@pytest.mark.spark
def test_crawl_budget_plan_shape(spark):
    """One host-key aggregate, broadcast robots join, 1-row broadcast
    total — no window, no Python, no sort-merge join."""
    from commoncrawl_spark.operators.schedule import crawl_budget

    frontier = spark.createDataFrame(
        [(f"h{i % 5}.test", 0.5, 0.5) for i in range(100)],
        "host string, p_changed double, q double")
    robots = spark.createDataFrame(
        [(f"h{i}.test", 15.0) for i in range(5)],
        "host string, crawl_delay_s double")
    out = crawl_budget(frontier, 50, robots=robots, quality_col="q")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan          # robots join
    assert "BroadcastNestedLoopJoin" in plan    # 1-row weight total


@pytest.mark.spark
def test_crawl_budget_multi_row_robots_does_not_fan_out(spark):
    """A per-user-agent robots log (several rows per host) must not
    duplicate quota rows or double-count the host's weight in the
    total: the most-restrictive (max) delay wins."""
    from commoncrawl_spark.operators.schedule import crawl_budget

    frontier = spark.createDataFrame(
        [("a.test", 1.0)] * 10 + [("b.test", 1.0)] * 10,
        "host string, p_changed double")
    robots = spark.createDataFrame(
        [("a.test", 10.0), ("a.test", 60.0), ("a.test", 30.0)],
        "host string, crawl_delay_s double")
    got = crawl_budget(frontier, 10, round_seconds=600.0,
                       robots=robots).collect()
    assert len(got) == 2  # one row per host, no join fan-out
    by = {r["host"]: r for r in got}
    assert by["a.test"]["politeness_cap"] == 10   # 600/60: max delay wins
    # equal weights -> 5 each; a.test's tripled rows must not have
    # shrunk b.test's share
    assert by["b.test"]["quota"] == 5
    assert by["a.test"]["quota"] == 5


@pytest.mark.spark
def test_revisit_records_classification(spark):
    from commoncrawl_spark.operators.temporal import revisit_records

    cur = spark.createDataFrame(
        [
            (1, "u1", "d1", "20240103000000"),  # prior has (u1,d1) -> revisit
            (2, "u1", "d2", "20240104000000"),  # new digest -> response
            (3, "u1", "d2", "20240105000000"),  # repeat in batch -> revisit->2
            (4, "u2", "d9", "20240104000000"),  # unseen url -> response
        ],
        "event_id long, url string, digest string, timestamp string")
    prior = spark.createDataFrame(
        [("u1", "d1", "20240101000000")],
        "url string, digest string, timestamp string")
    got = {r["event_id"]: (r["record_type"], r["refers_to_ts"])
           for r in revisit_records(cur, prior).collect()}
    assert got == {
        1: ("revisit", "20240101000000"),
        2: ("response", None),
        3: ("revisit", "20240104000000"),
        4: ("response", None),
    }


@pytest.mark.spark
def test_revisit_records_no_prior_and_tiebreak(spark):
    from commoncrawl_spark.operators.temporal import revisit_records

    # equal timestamps: the lower event_id is the original
    cur = spark.createDataFrame(
        [(5, "u", "d", "20240104000000"), (4, "u", "d", "20240104000000")],
        "event_id long, url string, digest string, timestamp string")
    got = {r["event_id"]: (r["record_type"], r["refers_to_ts"])
           for r in revisit_records(cur, None).collect()}
    assert got == {4: ("response", None),
                   5: ("revisit", "20240104000000")}


@pytest.mark.spark
def test_revisit_records_plan_no_window_no_python(spark):
    from commoncrawl_spark.operators.temporal import revisit_records

    cur = spark.createDataFrame(
        [(1, "u", "d", "t1")],
        "event_id long, url string, digest string, timestamp string")
    out = revisit_records(cur, None)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "partial_min" in plan      # map-side partial original fold
