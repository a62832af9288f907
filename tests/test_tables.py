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
def test_expire_and_vacuum(spark, tmp_path):
    """Maintenance cycle: expire old manifests, then vacuum drops exactly
    the data dirs no surviving manifest references (shared append files
    referenced by the survivors stay)."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(4).toDF("id"))          # s0
    t.overwrite(spark.range(6).toDF("id"))       # s1 — s0's dir now unshared
    t.append(spark.range(6, 9).toDF("id"))       # s2 — shares s1's dir

    expired = t.expire_snapshots(keep_last=2)
    assert expired == [0]
    # reads unaffected; history truncated at the expiration boundary
    assert t.read(spark).count() == 9
    assert [s["id"] for s in t.snapshots()] == [1, 2]
    with pytest.raises(FileNotFoundError):
        t.read(spark, snapshot_id=0)

    # crash leftover: data written, no manifest
    orphan = os.path.join(str(tmp_path / "t"), "data", "c99-deadbeef")
    spark.range(10).toDF("id").write.parquet(orphan)

    removed = t.vacuum()
    # s0's dir (expired, unshared) + the orphan go; s1/s2 dirs survive
    assert len(removed) == 2 and any(d.startswith("c0-") for d in removed)
    assert "c99-deadbeef" in removed
    assert t.read(spark).count() == 9
    assert t.read(spark, snapshot_id=1).count() == 6


@pytest.mark.spark
def test_vacuum_keeps_shared_append_files(spark, tmp_path):
    """An appended snapshot's manifest references its ancestors' data dirs,
    so expiring the ancestors must not let vacuum delete shared files."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(5).toDF("id"))       # s0
    t.append(spark.range(5, 8).toDF("id"))    # s1 references s0's dir too
    t.expire_snapshots(keep_last=1)
    assert t.vacuum() == []  # everything still referenced by s1
    assert t.read(spark).count() == 8


@pytest.mark.spark
def test_read_or_empty(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "missing"))
    df = t.read_or_empty(spark, "id long")
    assert df.count() == 0 and df.columns == ["id"]
