"""Snapshot table layer: atomic commits, time travel, crash-safety."""

from __future__ import annotations

import os

import pytest

from commoncrawl_spark.tables import SnapshotTable


@pytest.mark.spark
def test_append_read_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    assert not t.exists()
    s0 = t.append(spark.range(5).toDF("id"))
    s1 = t.append(spark.range(5, 8).toDF("id"), metadata={"round": 1})
    assert (s0, s1) == (0, 1)
    assert t.read(spark).count() == 8
    assert t.read(spark, snapshot_id=0).count() == 5
    assert t.snapshot()["metadata"] == {"round": 1}
    assert [s["id"] for s in t.snapshots()] == [0, 1]


@pytest.mark.spark
def test_overwrite_and_compact(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(10).toDF("id"))
    t.overwrite(spark.range(3).toDF("id"))
    assert t.read(spark).count() == 3
    t.append(spark.range(100, 104).toDF("id"))
    t.compact(spark, target_partitions=1)
    assert t.read(spark).count() == 7
    assert t.read(spark, snapshot_id=1).count() == 3  # history intact


@pytest.mark.spark
def test_orphan_data_ignored(spark, tmp_path):
    """A crash after data write but before manifest commit leaves an orphan
    dir that readers never see (write-then-swap protocol)."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(4).toDF("id"))
    orphan = os.path.join(str(tmp_path / "t"), "data", "c99-deadbeef")
    spark.range(1000).toDF("id").write.parquet(orphan)
    assert t.read(spark).count() == 4


@pytest.mark.spark
def test_read_or_empty(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "missing"))
    df = t.read_or_empty(spark, "id long")
    assert df.count() == 0 and df.columns == ["id"]
