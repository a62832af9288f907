"""Structured Streaming surface: file-source micro-batches -> dedup ->
snapshot-table commits; watermarked window aggregation."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.streaming.pipeline import (
    stream_cdx_jsonl,
    stream_to_snapshot_table,
    windowed_fetch_stats,
)
from commoncrawl_spark.tables import SnapshotTable


def _write_jsonl(path: str, rows: list[dict]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.replace(tmp, path)


def _cdx_row(i: int, status: str = "200") -> dict:
    return {
        "urlkey": f"test,example)/p/{i}",
        "timestamp": f"202401{i % 28 + 1:02d}000000",
        "url": f"https://example.test/p/{i}",
        "mime": "text/html",
        "mime-detected": "text/html",
        "status": status,
        "digest": f"D{i}",
        "length": str(1000 + i),
        "offset": "0",
        "filename": "seg.warc.gz",
    }


@pytest.mark.spark
def test_stream_files_to_snapshot_commits(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _write_jsonl(f"{landing}/batch0.jsonl", [_cdx_row(i) for i in range(20)])
    _write_jsonl(f"{landing}/batch1.jsonl",
                 [_cdx_row(i, "404") for i in range(10, 30)])

    stream = stream_cdx_jsonl(spark, landing, max_files_per_trigger=1)
    writer = stream_to_snapshot_table(
        stream,
        table_root=str(tmp_path / "cdx_table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=lambda df: df.filter(F.col("status") == "200"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    table = SnapshotTable(str(tmp_path / "cdx_table"))
    got = table.read(spark)
    assert got.count() == 20  # only the status-200 file survived the filter
    assert got.filter(F.col("status") != "200").count() == 0
    assert len(table.snapshots()) >= 1  # one commit per non-empty micro-batch


@pytest.mark.spark
def test_windowed_fetch_stats(spark, tmp_path):
    rows = []
    for i in range(60):
        rows.append(
            (f"2024-01-01 00:{i % 3:02d}:{i % 50 + 10:02d}",
             "example.test" if i % 4 else "other.test",
             "200" if i % 5 else "503")
        )
    src = spark.createDataFrame(rows, "event_ts string, host string, status string") \
        .withColumn("event_ts", F.to_timestamp("event_ts"))

    # run the same aggregation through a memory-sink stream
    d = str(tmp_path / "events")
    src.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(src.schema).parquet(d)
    agg = windowed_fetch_stats(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory").queryName("fetch_stats")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    time.sleep(1)
    got = {
        (r["window_start"].minute, r["host"]): (r["n_fetched"], r["n_ok"])
        for r in spark.sql("select * from fetch_stats").collect()
    }
    want: dict = {}
    for ts, host, status in rows:
        key = (int(ts[14:16]), host)
        n, ok = want.get(key, (0, 0))
        want[key] = (n + 1, ok + (status == "200"))
    assert got == want


@pytest.mark.spark
def test_per_host_admission_state_survives_micro_batches(spark, tmp_path):
    """applyInPandasWithState: the per-host admitted counter must carry
    across micro-batches (maxFilesPerTrigger=1 -> one batch per file), so
    a budget of 3 admits 2 from batch0 and only 1 from batch1."""
    from commoncrawl_spark.streaming.stateful import per_host_admission

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    rows0 = [{"host": "a.test", "url": f"https://a.test/{i}"} for i in range(2)]
    rows0 += [{"host": "b.test", "url": "https://b.test/0"}]
    rows1 = [{"host": "a.test", "url": f"https://a.test/{i}"} for i in range(2, 4)]
    _write_jsonl(f"{landing}/b0.jsonl", rows0)
    time.sleep(1.1)  # file mtime order = micro-batch order
    _write_jsonl(f"{landing}/b1.jsonl", rows1)

    stream = (
        spark.readStream.schema("host string, url string")
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    out = per_host_admission(stream, budget_per_host=3)
    q = (
        out.writeStream.format("memory").queryName("admissions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    time.sleep(1)
    got = spark.sql("select * from admissions").collect()
    by_url = {r["url"]: r for r in got}
    assert len(by_url) == 5  # nothing silently dropped
    a_admitted = sorted(
        u for u, r in by_url.items() if r["host"] == "a.test" and r["admitted"]
    )
    a_rejected = [u for u, r in by_url.items()
                  if r["host"] == "a.test" and not r["admitted"]]
    assert len(a_admitted) == 3 and len(a_rejected) == 1
    # batch0's two urls must both be admitted (state starts fresh),
    # and exactly one of batch1's (state carried n_admitted=2)
    assert "https://a.test/0" in a_admitted and "https://a.test/1" in a_admitted
    assert by_url["https://b.test/0"]["admitted"]
    # final counter visible on the last-admitted row
    assert max(r["host_admitted_total"] for r in got if r["host"] == "a.test") == 3


@pytest.mark.spark
def test_stream_crawl_end_to_end_exactly_once(spark, tmp_path):
    """The composed streaming crawl: CDX files land -> micro-batch dedup
    -> fetch join -> extraction -> snapshot commits. Draining twice (new
    files in between, with a duplicate capture of an already-crawled URL
    inside one batch) yields byte-identical articles, exactly once per
    URL within each landed batch."""
    from commoncrawl_spark.fixtures import _warc_wrap
    from commoncrawl_spark.streaming.pipeline import stream_crawl

    landing = tmp_path / "landing"
    landing.mkdir()

    def warc(i: int) -> bytes:
        url = f"https://example.test/p/{i}"
        html = (
            '<html><body><h1 class="content__headline">T</h1>'
            f'<div itemprop="articleBody"><p>body {i} text</p></div>'
            "</body></html>"
        )
        return _warc_wrap(html, url, "20240101000000", "utf-8", False)

    pages = spark.createDataFrame(
        [(f"https://example.test/p/{i}", warc(i)) for i in range(6)],
        "url string, html binary",
    )

    q = stream_crawl(spark, str(landing), pages,
                     str(tmp_path / "articles"), str(tmp_path / "ckpt"))

    # batch 1: urls 0-2, with url 1 captured twice (dedup inside batch)
    _write_jsonl(str(landing / "b1.jsonl"),
                 [_cdx_row(0), _cdx_row(1), _cdx_row(1, status="404"),
                  _cdx_row(2)])
    q.trigger(availableNow=True).start().awaitTermination(120)
    # batch 2: urls 3-5 land later
    _write_jsonl(str(landing / "b2.jsonl"),
                 [_cdx_row(3), _cdx_row(4), _cdx_row(5)])
    q.trigger(availableNow=True).start().awaitTermination(120)

    arts = SnapshotTable(str(tmp_path / "articles")).read(spark)
    got = {r["url"]: r["text"] for r in arts.collect()}
    assert sorted(got) == [f"https://example.test/p/{i}" for i in range(6)]
    assert arts.count() == 6  # once per URL: in-batch dedup + epoch commits
    for i in range(6):
        assert got[f"https://example.test/p/{i}"] == f"body {i} text"


@pytest.mark.spark
def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Two micro-batches (event-time ordered per key across batches):
    session ordinals continue across the batch boundary via the state
    store, and the assignment equals the batch sessionize on the
    concatenated input."""
    import pandas as pd

    from commoncrawl_spark.operators.temporal import sessionize
    from commoncrawl_spark.streaming.stateful import streaming_sessionize

    gap = 100  # seconds
    batch1 = [("u", 0), ("u", 50_000_000), ("v", 0)]
    # u's next event is 150s after its last (> gap) -> new session;
    # v's is 90s after (<= gap) -> same session, both across the boundary
    batch2 = [("u", 200_000_000), ("v", 90_000_000)]
    d = str(tmp_path / "sess_src")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate([batch1, batch2]):
        pd.DataFrame(rows, columns=["key", "ts_micros"]).to_parquet(
            f"{d}/b{i}.parquet")

    stream = (spark.readStream.schema("key string, ts_micros long")
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = streaming_sessionize(stream, gap_seconds=gap)
    (out.writeStream.format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
        .awaitTermination(120))
    got = {(r["key"], r["ts_micros"]): r["session_id"]
           for r in spark.sql("SELECT * FROM sessions").collect()}

    allrows = spark.createDataFrame(batch1 + batch2, "key string, ts long")
    want = {(r["key"], r["ts"]): r["session_id"]
            for r in sessionize(allrows, key_col="key", ts_col="ts",
                                gap_seconds=gap * 1_000_000).collect()}
    assert got == want
    assert got[("u", 200_000_000)] == "u#1"   # new session after boundary
    assert got[("v", 90_000_000)] == "v#0"    # continued across boundary


@pytest.mark.spark
def test_streaming_first_seen_cross_batch_first_wins(spark, tmp_path):
    """The streaming dedup twin: a key re-arriving in a LATER micro-batch
    is suppressed by the state store — the first batch's row survives,
    mirroring batch dedup_first_seen's keep-first semantics."""
    from commoncrawl_spark.streaming.stateful import streaming_first_seen

    landing = str(tmp_path / "landing_dedup")
    os.makedirs(landing)
    # batch1 re-publishes urls 10..19 with different digests
    _write_jsonl(f"{landing}/b0.jsonl", [_cdx_row(i) for i in range(20)])
    rows1 = [dict(_cdx_row(i), digest=f"LATE{i}") for i in range(10, 30)]
    _write_jsonl(f"{landing}/b1.jsonl", rows1)

    stream = stream_cdx_jsonl(spark, landing, max_files_per_trigger=1)
    deduped = streaming_first_seen(stream, ["url"])
    table = SnapshotTable(str(tmp_path / "first_seen"))
    writer = stream_to_snapshot_table(
        deduped, table_root=str(tmp_path / "first_seen"),
        checkpoint_dir=str(tmp_path / "ckpt_dedup"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {r["url"]: r["digest"]
           for r in table.read(spark).select("url", "digest").collect()}
    assert len(got) == 30  # 0..29, one row per url
    # overlap keys kept the FIRST batch's digest (file source orders
    # b0 before b1; max_files_per_trigger=1 makes them separate batches)
    for i in range(10, 20):
        assert got[f"https://example.test/p/{i}"] == f"D{i}"
    for i in range(20, 30):
        assert got[f"https://example.test/p/{i}"] == f"LATE{i}"


@pytest.mark.spark
def test_windowed_fetch_stats_watermark_drops_late_rows(spark, tmp_path):
    """Append mode + watermark as a two-batch stream: batch 1 replays a
    row 3 h older than the post-batch-0 watermark — it must be DROPPED
    (a stateless engine would double-count window 00:00); and only
    windows closed by the final watermark are emitted (the 04:xx
    window stays open in state)."""
    mk = lambda rows: [(f"2024-01-01 {h:02d}:{m:02d}:00", "h.test", "200")
                      for h, m in rows]
    b0 = mk([(0, 5), (0, 10), (1, 30), (3, 59)])   # wm after b0: 01:59
    b1 = mk([(4, 30), (4, 40)])
    # the late replay needs its OWN batch: the watermark computed from
    # batch N's event times takes effect one batch later, so a late row
    # packed into batch 1 would still be merged (its window is in state
    # and the filter wm is not yet advanced) — same staging as the
    # stream_window_stats driver query
    b2 = mk([(0, 20)])                             # 00:20 << wm: drop
    src = str(tmp_path / "src")
    for i, rows in enumerate([b0, b1, b2]):
        df = (spark.createDataFrame(
            rows, "event_ts string, host string, status string")
            .withColumn("event_ts", F.to_timestamp("event_ts")))
        bdir = os.path.join(src, f"b{i}")
        df.coalesce(1).write.parquet(bdir)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
    stream = (
        spark.readStream
        .schema("event_ts timestamp, host string, status string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src))
    agg = windowed_fetch_stats(stream, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("wm_drop")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    time.sleep(1)
    got = {r["window_start"].hour: r["n_fetched"]
           for r in spark.sql("select * from wm_drop").collect()}
    # final wm = 04:40 - 2h = 02:40: windows 00 and 01 are closed and
    # emitted, 03 and 04 stay open; the replayed 00:20 row did NOT
    # bump window 00 from 2 to 3
    assert got == {0: 2, 1: 1}


@pytest.mark.spark
def test_stream_static_range_enrich_is_stateless(spark, tmp_path):
    """Stream-static binned range join: enrichment works per
    micro-batch with NO state operator (the contrast with the keyed
    state store paths), and the union of batches equals the batch
    join."""
    import os

    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(i, (i * 7) % 40) for i in range(20)], "event_id long, ip long")
    rng = spark.createDataFrame(
        [(0, 9, "A"), (10, 19, "B"), (30, 39, "C")],
        "lo long, hi long, asn string")
    binned = F.broadcast(rng.select(
        "lo", "hi", "asn",
        F.explode(F.sequence(F.floor(F.col("lo") / 10),
                             F.floor(F.col("hi") / 10))).alias("_bin")))
    src = str(tmp_path / "src")
    for i, part in enumerate([pts.filter(F.col("event_id") < 10),
                              pts.filter(F.col("event_id") >= 10)]):
        bdir = os.path.join(src, f"b{i}")
        part.coalesce(1).write.parquet(bdir)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
    stream = (
        spark.readStream.schema("event_id long, ip long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src))
    enriched = (
        stream.withColumn("_bin", F.floor(F.col("ip") / 10))
        .join(binned, "_bin", "left")
        .select("event_id", F.when(
            (F.col("ip") >= F.col("lo")) & (F.col("ip") <= F.col("hi")),
            F.col("asn")).alias("asn")))
    query = (enriched.writeStream.format("memory").queryName("t_enrich")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
    query.awaitTermination(120)
    progress = query.recentProgress
    assert len(progress) >= 2  # two micro-batches ran
    assert all(not p["stateOperators"] for p in progress)  # stateless
    got = {r["event_id"]: r["asn"]
           for r in spark.table("t_enrich").collect()}
    want = {r["event_id"]: r["asn"] for r in pts.join(
        rng, (F.col("ip") >= F.col("lo")) & (F.col("ip") <= F.col("hi")),
        "left").select("event_id", "asn").collect()}
    assert got == want
