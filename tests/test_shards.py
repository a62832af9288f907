"""Training-shard export: size-derived shard count, deterministic md5
assignment, manifest integrity, partition-pruned single-shard reads."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.tables import read_shards, verify_shards, write_shards


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"doc-{i} " + "x" * 200) for i in range(400)],
        "doc_id long, text string").cache()


@pytest.mark.spark
def test_write_shards_roundtrip_and_manifest(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards"))
    # ~83 KB corpus, 10 KB target -> 9 shards
    m = write_shards(corpus, out, key="doc_id", target_bytes=10_000)
    assert m["n_shards"] == -(-m["total_bytes"] // 10_000)
    assert m["total_rows"] == 400
    assert sum(s["rows"] for s in m["shards"].values()) == 400
    # manifest on disk == returned dict
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == m
    # round trip: every row comes back, shard column pruned to dirs
    back = read_shards(spark, out)
    assert back.count() == 400
    assert set(back.columns) >= {"doc_id", "text", "_shard"}
    assert verify_shards(spark, out)["ok"]


@pytest.mark.spark
def test_shard_assignment_deterministic(spark, corpus, tmp_path_factory):
    """Same key -> same shard regardless of run or partitioning: a
    re-export reproduces identical shard membership."""
    o1 = str(tmp_path_factory.mktemp("sh1"))
    o2 = str(tmp_path_factory.mktemp("sh2"))
    m1 = write_shards(corpus, o1, key="doc_id", target_bytes=10_000)
    m2 = write_shards(corpus.repartition(13), o2, key="doc_id",
                      target_bytes=10_000)
    assert m1["shards"] == m2["shards"]
    a1 = {r["doc_id"]: r["_shard"]
          for r in read_shards(spark, o1).select("doc_id", "_shard").collect()}
    a2 = {r["doc_id"]: r["_shard"]
          for r in read_shards(spark, o2).select("doc_id", "_shard").collect()}
    assert a1 == a2


@pytest.mark.spark
def test_single_shard_read_prunes_partitions(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shprune"))
    m = write_shards(corpus, out, key="doc_id", target_bytes=10_000)
    one = read_shards(spark, out).filter(F.col("_shard") == 0)
    assert one.count() == m["shards"]["0"]["rows"]
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter on the directory column, not a data-file scan+filter
    assert "_shard" in plan.split("PartitionFilters")[1][:120]


@pytest.mark.spark
def test_verify_shards_detects_loss(spark, corpus, tmp_path_factory):
    import glob
    import shutil

    out = str(tmp_path_factory.mktemp("shloss"))
    write_shards(corpus, out, key="doc_id", target_bytes=10_000)
    victim = sorted(glob.glob(os.path.join(out, "data", "_shard=*")))[0]
    shutil.rmtree(victim)
    rep = verify_shards(spark, out)
    assert not rep["ok"] and rep["mismatches"]


@pytest.mark.spark
def test_tar_shards_roundtrip_and_determinism(spark, corpus, tmp_path_factory):
    import glob
    import hashlib
    import tarfile

    from commoncrawl_spark.tables import verify_tar_shards, write_tar_shards

    o1 = str(tmp_path_factory.mktemp("tar1"))
    o2 = str(tmp_path_factory.mktemp("tar2"))
    m = write_tar_shards(corpus, o1, key="doc_id", target_bytes=10_000)
    assert m["total_rows"] == 400
    assert verify_tar_shards(o1)["ok"]
    # members round-trip: every doc's text comes back byte-identical
    texts = {}
    for path in glob.glob(os.path.join(o1, "tars", "shard-*.tar")):
        with tarfile.open(path) as tf:
            for mem in tf.getmembers():
                texts[mem.name] = tf.extractfile(mem).read().decode()
    want = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert len(texts) == 400
    assert sorted(texts.values()) == sorted(want.values())
    # byte-deterministic: a re-export (different partitioning) produces
    # IDENTICAL archives
    write_tar_shards(corpus.repartition(13), o2, key="doc_id",
                     target_bytes=10_000)
    h1 = {os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
          for p in glob.glob(os.path.join(o1, "tars", "*.tar"))}
    h2 = {os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
          for p in glob.glob(os.path.join(o2, "tars", "*.tar"))}
    assert h1 == h2


@pytest.mark.spark
def test_verify_tar_shards_detects_loss(spark, corpus, tmp_path_factory):
    import glob

    from commoncrawl_spark.tables import verify_tar_shards, write_tar_shards

    out = str(tmp_path_factory.mktemp("tarloss"))
    write_tar_shards(corpus, out, key="doc_id", target_bytes=10_000)
    victim = sorted(glob.glob(os.path.join(out, "tars", "*.tar")))[0]
    os.remove(victim)
    rep = verify_tar_shards(out)
    assert not rep["ok"] and rep["mismatches"]
