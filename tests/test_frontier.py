"""Frontier round loop: politeness scheduling vs a pure-Python oracle,
crawl-ordering trace, byte-identical extraction, crash-resume equivalence,
transient-failure retry, robots gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.fixtures import CRAWLS
from commoncrawl_spark.functions.urls import canonicalize_url_py
from commoncrawl_spark.operators.dedup import deduplicate_records_py
from commoncrawl_spark.plans.frontier import CrawlJob

BUDGET = 40


@pytest.fixture(scope="module")
def tables(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").cache()
    cdx = spark.read.parquet(f"{fixture_dir}/cdx.parquet").cache()
    robots = spark.read.parquet(f"{fixture_dir}/robots.parquet").cache()
    return pages, cdx, robots


def _host_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    netloc = rest.split("/", 1)[0].lower()
    if netloc.startswith("www."):
        netloc = netloc[4:]
    return netloc.split(":")[0]


def python_crawl_oracle(cdx_rows, budget, crawl_order, fetchable, max_retries=3,
                        backoff_cap=300):
    """Reference-faithful simulation: dedup fold -> 200 filter -> per-round
    per-host top-budget by (crawl_rank, page, line_no); URLs missing from
    ``fetchable`` fail transiently and retry with attempt+1 until
    max_retries, then are exhausted (ST3 retry-until-drained semantics).
    A row failing on attempt a backs off min(2*2^a, cap) rounds before
    re-eligibility (the reference's 2*2^attempt pacing at round
    granularity); rounds where everything is backing off fast-forward to
    the earliest eligibility. Returns (trace rows, seen sha1 set)."""
    best = deduplicate_records_py(cdx_rows, canonicalize_url_py)
    rank = {c: i for i, c in enumerate(crawl_order)}
    frontier = [
        {
            "url": r["url"],
            "host": _host_of(r["url"]),
            "prio": (rank[r["crawl"]], r["page"], r["line_no"]),
            "attempt": 0,
            "not_before": 0,
        }
        for r in best.values()
        if r["status"] == "200"
    ]
    trace, seen = [], set()
    rnd = 0
    while frontier:
        eligible = [r for r in frontier if r["not_before"] <= rnd]
        if not eligible:
            rnd = min(r["not_before"] for r in frontier)  # fast-forward
            continue
        by_host: dict[str, list] = {}
        for rec in sorted(eligible, key=lambda r: r["prio"]):
            by_host.setdefault(rec["host"], []).append(rec)
        batch = []
        for host, recs in by_host.items():
            for i, rec in enumerate(recs[:budget]):
                batch.append((rnd, host, i + 1, rec["url"]))
                trace.append((rnd, host, i + 1, rec["url"]))
        if not batch:
            break
        picked = {u for _, _, _, u in batch}
        remaining = []
        for rec in frontier:
            if rec["url"] not in picked:
                remaining.append(rec)
                continue
            key = hashlib.sha1(canonicalize_url_py(rec["url"]).encode()).hexdigest()
            if rec["url"] in fetchable:
                seen.add(key)  # fetched
            elif rec["attempt"] >= max_retries:
                seen.add(key)  # exhausted
            else:
                rec["not_before"] = rnd + min(2 * 2 ** rec["attempt"], backoff_cap)
                rec["attempt"] += 1
                remaining.append(rec)  # transient failure -> retry later
        frontier = remaining
        rnd += 1
    return trace, seen


@pytest.fixture(scope="module")
def full_run(spark, tables, tmp_path_factory):
    pages, cdx, robots = tables
    job = CrawlJob(
        spark, str(tmp_path_factory.mktemp("crawl_full")), budget_per_host=BUDGET
    )
    n = job.seed_from_cdx(cdx, crawl_order=CRAWLS)
    rounds = job.run(pages)
    return job, n, rounds


@pytest.mark.spark
def test_crawl_drains_and_orders_like_oracle(spark, tables, full_run):
    pages, cdx, _ = tables
    job, n_seeded, rounds = full_run
    assert n_seeded > 0 and rounds

    cdx_rows = [r.asDict() for r in cdx.orderBy("crawl", "page", "line_no").collect()]
    fetchable = {r["url"] for r in pages.select("url").collect()}
    oracle_trace, oracle_seen = python_crawl_oracle(cdx_rows, BUDGET, CRAWLS, fetchable)

    got_trace = {
        (r["round"], r["host"], r["host_rank"], r["url"])
        for r in job.trace_df().collect()
    }
    assert got_trace == set(oracle_trace)

    got_seen = {r["url_sha1"] for r in job.seen_df().collect()}
    assert got_seen == oracle_seen


@pytest.mark.spark
def test_extracted_text_byte_identical(spark, tables, full_run):
    pages, _, _ = tables
    job, _, _ = full_run
    arts = job.articles_df().select("url", F.col("text").alias("got"))
    golden = pages.select("url", F.col("text").alias("want"))
    joined = arts.join(golden, "url")
    assert joined.count() == arts.count()
    assert joined.filter(F.col("got") != F.col("want")).count() == 0
    # failures are logged, not dropped: articles + failures == fetched urls
    n_failed = job.failures.read(spark).count()
    assert arts.count() + n_failed == job.seen_df().count()


@pytest.mark.spark
def test_per_host_budget_respected(full_run):
    job, _, _ = full_run
    per = (
        job.trace_df().groupBy("round", "host").count().agg(F.max("count")).first()[0]
    )
    assert per <= BUDGET


@pytest.mark.spark
def test_metrics_lineage(spark, full_run):
    job, _, rounds = full_run
    m = job.metrics_df()
    tot = m.agg(F.sum("n_selected"), F.sum("n_fetched")).first()
    assert tot[0] == sum(r["selected"] for r in rounds)
    assert tot[1] == sum(r["fetched"] for r in rounds)
    # per-partition lineage accounts for every fetched row, per round
    lin = job.lineage.read(spark)
    per_round = {r["round"]: r["s"] for r in
                 lin.groupBy("round").agg(F.sum("n_rows").alias("s")).collect()}
    # lineage covers exactly the rounds that fetched something; rounds
    # that only fast-forwarded the backoff clock or only exhausted
    # failures produce no per-partition rows
    assert per_round == {r["round"]: r["fetched"] for r in rounds if r["fetched"]}
    assert lin.filter(F.col("min_key") > F.col("max_key")).count() == 0


@pytest.mark.spark
def test_resume_equals_uninterrupted(spark, tables, full_run, tmp_path_factory):
    pages, cdx, _ = tables
    ref_job, _, _ = full_run

    d = str(tmp_path_factory.mktemp("crawl_resume"))
    job1 = CrawlJob(spark, d, budget_per_host=BUDGET)
    job1.seed_from_cdx(cdx, crawl_order=CRAWLS)
    job1.run(pages, max_rounds=2)  # "crash" after round 2
    job2 = CrawlJob(spark, d, budget_per_host=BUDGET)  # fresh process resumes
    job2.run(pages)

    for name, a, b in [
        ("seen", ref_job.seen_df(), job2.seen_df()),
        ("articles", ref_job.articles_df().select("url", "text"),
         job2.articles_df().select("url", "text")),
        ("trace", ref_job.trace_df(), job2.trace_df()),
    ]:
        ra = {tuple(r) for r in a.collect()}
        rb = {tuple(r) for r in b.collect()}
        assert ra == rb, f"{name} diverged after resume"


@pytest.mark.spark
def test_transient_failures_retried_to_same_result(spark, tables, full_run,
                                                   tmp_path_factory):
    pages, cdx, _ = tables
    ref_job, _, _ = full_run
    d = str(tmp_path_factory.mktemp("crawl_flaky"))
    job = CrawlJob(spark, d, budget_per_host=BUDGET, max_retries=3)
    job.seed_from_cdx(cdx, crawl_order=CRAWLS)
    # ~1/4 of first-attempt fetches fail transiently
    flaky = (F.col("attempt") == 0) & (F.pmod(F.xxhash64("url"), F.lit(4)) == 0)
    job.run(pages, transient_fail=flaky)

    a = {tuple(r) for r in ref_job.seen_df().collect()}
    b = {tuple(r) for r in job.seen_df().collect()}
    assert a == b
    ta = {tuple(r) for r in ref_job.articles_df().select("url", "text").collect()}
    tb = {tuple(r) for r in job.articles_df().select("url", "text").collect()}
    assert ta == tb


@pytest.mark.spark
def test_crawl_delay_derives_per_host_budget(spark, tables, tmp_path_factory):
    pages, cdx, _ = tables
    # hot host: 1 s delay -> 10 fetches per 10 s round; others: 0.2 s -> 50
    robots = spark.createDataFrame(
        [("example-news.test", [], 1.0)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double",
    )
    d = str(tmp_path_factory.mktemp("crawl_delay"))
    job = CrawlJob(spark, d, budget_per_host=BUDGET, round_seconds=10.0)
    job.seed_from_cdx(cdx, crawl_order=CRAWLS)
    job.run(pages, robots=robots, max_rounds=3)
    per = {
        (r["round"], r["host"]): r["count"]
        for r in job.trace_df().groupBy("round", "host").count().collect()
    }
    hot = [v for (rnd, h), v in per.items() if h == "example-news.test"]
    cold = [v for (rnd, h), v in per.items() if h != "example-news.test"]
    assert hot and max(hot) <= 10  # floor(10 s / 1.0 s)
    assert max(cold, default=0) <= BUDGET  # hosts without rules: default cap


@pytest.mark.spark
def test_robots_gating(spark, tables, tmp_path_factory):
    pages, cdx, _ = tables
    # forbid the hot host's /sport prefix
    robots = spark.createDataFrame(
        [("example-news.test", ["/sport"], 0.2)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double",
    )
    d = str(tmp_path_factory.mktemp("crawl_robots"))
    job = CrawlJob(spark, d, budget_per_host=BUDGET)
    job.seed_from_cdx(cdx, crawl_order=CRAWLS)
    job.run(pages, robots=robots)
    fetched = job.trace_df().filter(
        (F.col("host") == "example-news.test") & F.col("url").rlike("/sport/")
    )
    assert fetched.count() == 0
    # gated URLs remain unfetched in the frontier (never silently dropped)
    left = job.frontier.read(spark)
    assert left.filter(F.col("url").rlike("/sport/")).count() > 0


@pytest.mark.spark
def test_mid_round_crash_between_commits_replays_idempotently(
        spark, tables, full_run, tmp_path_factory):
    """_append_once's replay-skip path, exercised at the crash point it
    exists for: the process dies AFTER some of a round's table commits
    but BEFORE the frontier commit (the resume authority, committed
    last). Rolling the later tables back to their pre-round snapshot
    simulates that crash; the resumed job must replay the round,
    re-commit exactly the missing tables (skipping the committed ones),
    and converge to the uninterrupted run's state."""
    import os

    from commoncrawl_spark.tables import SnapshotTable

    pages, cdx, _ = tables
    ref_job, _, _ = full_run
    d = str(tmp_path_factory.mktemp("crawl_crash"))
    job1 = CrawlJob(spark, d, budget_per_host=BUDGET)
    job1.seed_from_cdx(cdx, crawl_order=CRAWLS)
    job1.run(pages, max_rounds=1)  # round 0 commits all tables

    def rollback(name):
        t = SnapshotTable(os.path.join(d, name))
        cur = t.snapshot()
        assert cur is not None, name
        latest = os.path.join(d, name, "_snapshots", "LATEST")
        if cur["parent"] is None:
            os.remove(latest)  # round 0 was the first commit ever
        else:
            with open(latest, "w") as fh:
                fh.write(str(cur["parent"]))

    # crash point: articles/failures/trace landed, then the process died
    # — metrics/lineage/seen/frontier never committed round 0
    for name in ("metrics", "lineage", "seen", "frontier"):
        rollback(name)

    job2 = CrawlJob(spark, d, budget_per_host=BUDGET)  # fresh process
    job2.run(pages)

    for name, a, b in [
        ("seen", ref_job.seen_df(), job2.seen_df()),
        ("articles", ref_job.articles_df().select("url", "text"),
         job2.articles_df().select("url", "text")),
        ("trace", ref_job.trace_df(), job2.trace_df()),
    ]:
        ra = {tuple(r) for r in a.collect()}
        rb = {tuple(r) for r in b.collect()}
        assert ra == rb, f"{name} diverged after mid-round crash replay"
    # the replay did NOT double-commit the already-landed tables: one
    # round-0 commit each
    arts = SnapshotTable(os.path.join(d, "articles"))
    r0 = [s for s in arts.snapshots()
          if s["metadata"].get("round") == 0]
    assert len(r0) == 1


@pytest.mark.spark
def test_unlisted_crawls_rank_last_not_first(spark, tables,
                                             tmp_path_factory):
    """A crawl absent from crawl_order must sort AFTER every listed
    crawl (NULL rank would sort FIRST under Spark's ascending order,
    silently preempting the caller's explicit priority)."""
    pages, cdx, _ = tables
    d = str(tmp_path_factory.mktemp("crawl_rank"))
    job = CrawlJob(spark, d, budget_per_host=BUDGET)
    # list only the SECOND crawl: its rows rank 0; every other crawl's
    # rows get rank len(order)=1 — never NULL (the frontier drops the
    # crawl column, so assert on the rank distribution)
    job.seed_from_cdx(cdx, crawl_order=[CRAWLS[1]])
    fr = job._read_frontier()
    assert fr.filter(F.col("crawl_rank").isNull()).count() == 0
    ranks = {r["crawl_rank"] for r in
             fr.select("crawl_rank").distinct().collect()}
    assert ranks == {0, 1}
    # the listed crawl is the minority of the fixture's captures
    assert fr.filter(F.col("crawl_rank") == 1).count() > 0


@pytest.mark.spark
def test_evict_validates_before_mutating_seen(spark, tables, full_run,
                                              tmp_path_factory):
    """requeue=True with a url-less frame must raise BEFORE the seen
    table is touched — raising after would strand the keys: evicted
    from seen yet never requeued."""
    pages, cdx, _ = tables
    d = str(tmp_path_factory.mktemp("crawl_evict_guard"))
    job = CrawlJob(spark, d, budget_per_host=BUDGET)
    job.seed_from_cdx(cdx, crawl_order=CRAWLS)
    job.run(pages, max_rounds=1)
    before = {r["url_sha1"] for r in job.seen_df().collect()}
    assert before
    keyed = job.seen_df().select("url_sha1").limit(5)
    with pytest.raises(ValueError, match="url column"):
        job.evict_for_recrawl(keyed, requeue=True)
    after = {r["url_sha1"] for r in job.seen_df().collect()}
    assert after == before  # nothing was evicted


# ---------------------------------------------------------------------------
# feed-driven seeding
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_seed_from_feeds_freshness_dedup_and_merge(spark, tmp_path):
    from commoncrawl_spark.plans.frontier import CrawlJob

    rss = ('<rss><channel>'
           '<item><title>new</title><link>https://n.test/fresh</link>'
           '<pubDate>Tue, 7 Sep 2021 10:00:00 GMT</pubDate></item>'
           '<item><title>old</title><link>https://n.test/stale</link>'
           '<pubDate>Mon, 1 Jan 2001 00:00:00 GMT</pubDate></item>'
           '<item><title>nodate</title><link>https://n.test/nodate</link>'
           '</item></channel></rss>')
    # a second feed re-announces /fresh with an older date: the
    # first-priority-wins merge must keep the fresher copy
    rss2 = ('<rss><channel>'
            '<item><title>dup</title><link>https://n.test/fresh</link>'
            '<pubDate>Sat, 1 Jan 2011 00:00:00 GMT</pubDate></item>'
            '</channel></rss>')
    feeds = spark.createDataFrame(
        [("https://n.test/feed1", rss), ("https://n.test/feed2", rss2)],
        "feed_url string, xml string")

    job = CrawlJob(spark, str(tmp_path / "ckpt"), budget_per_host=10)
    n = job.seed_from_feeds(feeds)
    rows = {r["url"]: r for r in job.frontier.read(spark).collect()}
    assert n == 3 and set(rows) == {"https://n.test/fresh",
                                    "https://n.test/stale",
                                    "https://n.test/nodate"}
    # freshness ordering: fresher entries carry a smaller page value
    assert (rows["https://n.test/fresh"]["page"]
            < rows["https://n.test/stale"]["page"]
            < rows["https://n.test/nodate"]["page"])
    assert rows["https://n.test/nodate"]["page"] == 99999
    # the duplicate announcement lost: 2021's staleness, not 2011's
    import datetime
    want = (datetime.date(2100, 1, 1) - datetime.date(2021, 9, 7)).days
    assert rows["https://n.test/fresh"]["page"] == want

    # re-seeding from the same feeds after marking /fresh seen: the
    # seen filter drops it, the merge keeps the untouched rows
    seen = spark.createDataFrame(
        [("https://n.test/fresh",)], "url string")
    from commoncrawl_spark.operators.seen_set import with_url_key
    job.seen.overwrite(
        with_url_key(seen).select("url_sha1"), {"round": 0})
    n2 = job.seed_from_feeds(feeds)
    assert n2 == 3  # merged frontier still holds the earlier fresh row
    # but a FRESH checkpoint seeded after seen would exclude it
    job2 = CrawlJob(spark, str(tmp_path / "ckpt2"), budget_per_host=10)
    job2.seen.overwrite(
        with_url_key(seen).select("url_sha1"), {"round": 0})
    assert job2.seed_from_feeds(feeds) == 2
