"""WARC segment source: member-by-member split fidelity, error
side-channel on malformed bytes, and the composed segment -> records ->
byte-identical text pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.sources.warc import (
    make_warc_response,
    make_warc_segment,
    read_warc_records,
    split_warc_records_py,
)


def _recs(n, tag=""):
    return [
        make_warc_response(f"https://w.test/{tag}{i}",
                           f"<html><body>doc {tag}{i}</body></html>".encode())
        for i in range(n)
    ]


@pytest.mark.spark
@pytest.mark.parametrize("gz", [True, False])
def test_read_warc_records_roundtrip(spark, gz):
    segs = [
        ("seg-0", make_warc_segment(_recs(3, "a"), gzip_members=gz)),
        ("seg-1", make_warc_segment(_recs(2, "b"), gzip_members=gz)),
    ]
    df = spark.createDataFrame(segs, "path string, segment binary")
    got = read_warc_records(df).orderBy("path", "record_idx").collect()
    assert [(r["path"], r["record_idx"], r["target_uri"], r["error"])
            for r in got] == [
        ("seg-0", 0, "https://w.test/a0", None),
        ("seg-0", 1, "https://w.test/a1", None),
        ("seg-0", 2, "https://w.test/a2", None),
        ("seg-1", 0, "https://w.test/b0", None),
        ("seg-1", 1, "https://w.test/b1", None),
    ]
    assert bytes(got[1]["payload"]).endswith(b"doc a1</body></html>")
    assert all(r["warc_type"] == "response" for r in got)


@pytest.mark.spark
def test_read_warc_records_error_side_channel(spark):
    ok = make_warc_segment(_recs(1), gzip_members=False)
    df = spark.createDataFrame(
        [("good", ok), ("junk", b"not a warc at all"),
         ("gz-broken", b"\x1f\x8b broken member")],
        "path string, segment binary")
    got = {r["path"]: r for r in read_warc_records(df).collect()}
    assert got["good"]["error"] is None
    assert got["junk"]["error"] == "bad_magic"
    assert got["gz-broken"]["error"] == "bad_gzip_member"


@pytest.mark.spark
def test_segment_to_text_composition(spark):
    """Segment bytes -> records -> html_from_warc == the exact source
    html: the whole-file ingestion path composes with the byte-identity
    extraction chain (C3-C5)."""
    from commoncrawl_spark.functions.extract import html_from_warc

    html = "<html><body>précis — naïve</body></html>"
    seg = make_warc_segment(
        [make_warc_response("https://w.test/x", html.encode("utf-8"))])
    # the segment's single gzip member IS the reference's ranged-GET
    # shape: html_from_warc (gzip -> WARC header -> HTTP -> charset)
    # consumes it whole; the trailing CRLFCRLF record separator rides
    # along exactly as it does for the reference (the HTML parser
    # ignores trailing whitespace)
    assert html_from_warc(seg) == html + "\r\n\r\n"
    # the record source agrees on the payload: its HTTP body is the
    # same bytes the charset chain decoded
    df = spark.createDataFrame([("s", seg)], "path string, segment binary")
    row = read_warc_records(df).first()
    assert row["error"] is None
    body = bytes(row["payload"]).split(b"\r\n\r\n", 1)[1]
    assert body.decode("utf-8") == html


def test_offsets_allow_reslicing_plain_segments():
    """record_offset on a PLAIN segment is the byte position of the
    record header — re-slicing the original bytes from it re-parses the
    identical record (the ranged-GET correlation J3 depends on)."""
    recs = _recs(3)
    seg = make_warc_segment(recs, gzip_members=False)
    out = split_warc_records_py(seg)
    for r in out:
        again = split_warc_records_py(seg[r["record_offset"]:])
        assert again[0]["target_uri"] == r["target_uri"]
        assert again[0]["payload"] == r["payload"]


def test_warc_cdx_offsets_slice_and_gunzip_roundtrip(spark):
    """The CDX contract that matters: every (offset, length) row slices
    its segment to exactly one gzip member whose record parses back to
    the same payload — i.e. a cc-index consumer can ranged-GET with
    these numbers (the S6 path) and get the document."""
    import gzip

    from commoncrawl_spark.sources.warc import (
        make_warc_response,
        make_warc_segment,
        read_warc_records,
        split_warc_records_py,
        warc_cdx_index,
    )

    docs = [(i, f"seg doc {i} body " + "x" * (i * 7 % 50)) for i in range(9)]
    recs_a = [make_warc_response(f"https://ex.org/a/{i}", t.encode())
              for i, t in docs[:5]]
    recs_b = [make_warc_response(f"https://ex.org/b/{i}", t.encode())
              for i, t in docs[5:]]
    seg_bytes = {0: make_warc_segment(recs_a), 1: make_warc_segment(recs_b)}
    segs = spark.createDataFrame(
        [(k, v) for k, v in seg_bytes.items()], "seg int, segment binary")
    cdx = warc_cdx_index(read_warc_records(segs, "segment"), segs).collect()

    assert len(cdx) == 9
    by_seg: dict[int, list] = {}
    for r in cdx:
        by_seg.setdefault(r["seg"], []).append(r)
    for seg, rows in by_seg.items():
        blob = seg_bytes[seg]
        rows = sorted(rows, key=lambda r: r["offset"])
        # lengths tile the segment exactly: contiguous, no gaps
        assert rows[0]["offset"] == 0
        assert sum(r["length"] for r in rows) == len(blob)
        for r in rows:
            member = blob[r["offset"]:r["offset"] + r["length"]]
            rec = split_warc_records_py(gzip.decompress(member))
            assert len(rec) == 1 and rec[0]["error"] is None
            assert rec[0]["target_uri"] == r["url"]
            import hashlib

            assert hashlib.sha256(rec[0]["payload"]).hexdigest() == r["digest"]
    # surt ordering property: sorting by surt clusters the host's paths
    surts = sorted(r["surt"] for r in cdx)
    assert surts[0].startswith("org,ex)/a/") and surts[-1].startswith(
        "org,ex)/b/")


def test_write_cdx_index_prefix_locality_and_pushdown(spark, tmp_path):
    """The SURT layout contract: range-partitioning on (surt, cdx_ts)
    puts each host's rows in at most two files (contiguous run, one
    boundary crossing), and a host-prefix query reaches the parquet
    scan as a pushed filter."""
    from pyspark.sql import functions as F

    from commoncrawl_spark.tables import write_cdx_index

    rows = []
    for h in range(8):
        for p in range(40):
            rows.append((f"com,host{h})/p/{p:03d}", "20240101000000",
                         f"https://host{h}.com/p/{p:03d}", f"d{h}-{p}"))
    cdx = spark.createDataFrame(
        rows, "surt string, cdx_ts string, url string, digest string")
    out = str(tmp_path / "cdx_index")
    write_cdx_index(cdx, out, n_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    per_host_files = (
        back.select("surt", F.input_file_name().alias("f"))
        .withColumn("host", F.regexp_extract("surt", r"^([^)]*)\)", 1))
        .groupBy("host").agg(F.countDistinct("f").alias("nf"))
        .collect()
    )
    assert all(r["nf"] <= 2 for r in per_host_files)
    # and the index actually split across shards
    n_files = back.select(F.input_file_name()).distinct().count()
    assert n_files >= 3

    q = back.filter(F.col("surt").startswith("com,host3)"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StringStartsWith" in plan
    assert q.count() == 40


def test_warc_cdx_lengths_stop_at_interleaved_non_response_records(spark):
    """Real WARCs interleave request/metadata records between
    responses; a response's CDX length must stop at the NEXT record of
    ANY type, not silently absorb the interleaved record's bytes."""
    import gzip

    from commoncrawl_spark.sources.warc import (
        make_warc_response,
        make_warc_segment,
        read_warc_records,
        split_warc_records_py,
        warc_cdx_index,
    )

    def make_request(url):
        body = b"GET / HTTP/1.1\r\nHost: x\r\n\r\n"
        hdr = (f"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: {url}"
               f"\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "
               f"{len(body)}\r\n\r\n").encode("ascii")
        return hdr + body + b"\r\n\r\n"

    recs = [
        make_warc_response("https://m.test/1", b"first body"),
        make_request("https://m.test/1"),
        make_warc_response("https://m.test/2", b"second body"),
    ]
    blob = make_warc_segment(recs)
    segs = spark.createDataFrame([(0, blob)], "seg int, segment binary")
    cdx = sorted(
        warc_cdx_index(read_warc_records(segs, "segment"), segs).collect(),
        key=lambda r: r["offset"])
    assert len(cdx) == 2  # only the responses are indexed
    # first response's slice must end BEFORE the request record
    assert cdx[0]["offset"] == 0
    assert cdx[0]["length"] == len(gzip.compress(recs[0], 6, mtime=0))
    for r in cdx:
        member = blob[r["offset"]:r["offset"] + r["length"]]
        parsed = split_warc_records_py(gzip.decompress(member))
        assert len(parsed) == 1 and parsed[0]["warc_type"] == "response"
        assert parsed[0]["target_uri"] == r["url"]


@pytest.mark.spark
def test_zipnum_cluster_idx_matches_python_blocking(spark):
    """Block starts/counts/shards equal a plain sorted-list blocking —
    including a non-full final block — regardless of input partitioning."""
    from commoncrawl_spark.tables import zipnum_cluster_idx

    rows = [("com,%c)/p%02d" % (97 + i % 5, i), "2020%010d" % (i * 7))
            for i in range(103)]
    df = spark.createDataFrame(rows, "surt string, cdx_ts string")
    got = sorted(
        ((r["block_seq"], r["shard"], r["start_surt"],
          r["start_cdx_ts"], r["n_lines"])
         for r in zipnum_cluster_idx(
             df.repartition(7), lines_per_block=10,
             blocks_per_shard=3).collect()))
    want = []
    srt = sorted(rows)
    for b in range(0, len(srt), 10):
        blk = srt[b:b + 10]
        want.append((b // 10, (b // 10) // 3, blk[0][0], blk[0][1],
                     len(blk)))
    assert got == want
    # 103 rows -> 11 blocks, last block has 3 lines
    assert got[-1][4] == 3


@pytest.mark.spark
def test_zipnum_cluster_idx_routes_prefix_lookups(spark):
    """The binary-search contract: every key belongs to the LAST block
    whose start <= key — verify each key's routed block really holds it."""
    from commoncrawl_spark.tables import zipnum_cluster_idx

    rows = [("org,site)/%03d" % i, "20200101") for i in range(60)]
    df = spark.createDataFrame(rows, "surt string, cdx_ts string")
    idx = sorted(
        (r["start_surt"], r["block_seq"])
        for r in zipnum_cluster_idx(df, lines_per_block=8).collect())
    srt = sorted(r[0] for r in rows)
    for pos, key in enumerate(srt):
        routed = max(b for s, b in idx if s <= key)
        assert routed == pos // 8

    # and the idx is tiny relative to the stream: ceil(60/8) rows
    assert len(idx) == 8


@pytest.mark.spark
def test_zipnum_cluster_idx_plan_has_no_window(spark):
    """The global rank must come from the zipWithIndex shape (range
    exchange + id + broadcast offsets), never a partition-less window
    and never Python."""
    from commoncrawl_spark.tables import zipnum_cluster_idx

    df = spark.range(500).selectExpr(
        "concat('org,h', CAST(id % 9 AS STRING), ')/p', CAST(id AS STRING)) AS surt",
        "CAST(20200000000000 + id AS STRING) AS cdx_ts")
    out = zipnum_cluster_idx(df, lines_per_block=32)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # offsets fix-up joins broadcast


def test_make_wet_record_bytes_deterministic():
    from commoncrawl_spark.sources.warc import make_wet_record

    r1 = make_wet_record("https://a.test/x", "héllo wörld")
    assert r1 == make_wet_record("https://a.test/x", "héllo wörld")
    # Content-Length counts UTF-8 BYTES of the payload, not characters
    assert b"Content-Length: 13\r\n" in r1
    assert b"WARC-Type: conversion\r\n" in r1
    assert r1.endswith("héllo wörld".encode() + b"\r\n\r\n")


@pytest.mark.spark
def test_wet_segments_roundtrip_byte_identical(spark):
    """Export -> re-read through the real reader: payload bytes equal
    the original text exactly; records are url-sorted per shard; and
    the segment bytes themselves are reproducible across exports."""
    from commoncrawl_spark.sources.warc import (
        read_warc_records, wet_segments)

    rows = [(f"https://s.test/{i}", f"text-{i} é{i}", i % 3)
            for i in range(20)]
    df = spark.createDataFrame(rows, "url string, text string, shard int")
    segs1 = {r["shard"]: bytes(r["segment"])
             for r in wet_segments(df).collect()}
    segs2 = {r["shard"]: bytes(r["segment"])
             for r in wet_segments(df.repartition(5)).collect()}
    assert segs1 == segs2  # byte-identical re-export
    recs = read_warc_records(wet_segments(df), "segment").collect()
    assert all(r["error"] is None for r in recs)
    assert all(r["warc_type"] == "conversion" for r in recs)
    by_uri = {r["target_uri"]: bytes(r["payload"]).decode() for r in recs}
    assert by_uri == {u: t for u, t, _ in rows}
    # url-sorted within shard
    for sh in (0, 1, 2):
        uris = [r["target_uri"] for r in
                sorted((x for x in recs if x["shard"] == sh),
                       key=lambda x: x["record_idx"])]
        assert uris == sorted(uris)


@pytest.mark.spark
def test_wet_segments_duplicate_urls_still_byte_deterministic(spark):
    """Duplicate captures of one URL (normal in recrawl corpora) must
    not make segment bytes depend on shuffle arrival order — the
    builder tiebreaks the in-shard sort by text."""
    from commoncrawl_spark.sources.warc import wet_segments

    rows = [("https://d.test/a", f"version-{i}", 0) for i in range(6)]
    rows += [("https://d.test/b", "only", 0)]
    df = spark.createDataFrame(rows, "url string, text string, shard int")
    b1 = bytes(wet_segments(df).collect()[0]["segment"])
    b2 = bytes(wet_segments(df.repartition(7)).collect()[0]["segment"])
    assert b1 == b2


@pytest.mark.spark
def test_warc_segments_response_roundtrip(spark):
    """The archive-side export: response records carry the FULL HTTP
    block (status line + headers + body); re-reading through the real
    reader recovers it byte-identically, and the extractor-visible body
    sits after the header split exactly where real CC segments put it.
    Segment bytes are reproducible across partitionings."""
    from commoncrawl_spark.sources.warc import (
        read_warc_records, warc_segments)

    rows = [(f"https://r.test/{i}", f"<html><body>b{i} é</body></html>"
             .encode(), i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "url string, html binary, shard int")
    segs1 = {r["shard"]: bytes(r["segment"])
             for r in warc_segments(df).collect()}
    segs2 = {r["shard"]: bytes(r["segment"])
             for r in warc_segments(df.repartition(3)).collect()}
    assert segs1 == segs2
    recs = read_warc_records(warc_segments(df), "segment").collect()
    assert all(r["error"] is None for r in recs)
    assert all(r["warc_type"] == "response" for r in recs)
    want = {u: h for u, h, _ in rows}
    for r in recs:
        payload = bytes(r["payload"])
        assert payload.startswith(b"HTTP/1.1 200 OK\r\n")
        body = payload.split(b"\r\n\r\n", 1)[1]
        assert body == want[r["target_uri"]]
        assert r["content_length"] == len(payload)


def test_make_wat_record_bytes_deterministic():
    from commoncrawl_spark.sources.warc import make_wat_record

    pj = '{"Envelope":{"k":"vé"}}'
    r1 = make_wat_record("https://a.test/x", pj)
    assert r1 == make_wat_record("https://a.test/x", pj)
    # Content-Length counts UTF-8 BYTES of the JSON payload
    assert f"Content-Length: {len(pj.encode())}\r\n".encode() in r1
    assert b"WARC-Type: metadata\r\n" in r1
    assert b"Content-Type: application/json\r\n" in r1
    assert r1.endswith(pj.encode() + b"\r\n\r\n")


@pytest.mark.spark
def test_wat_segments_roundtrip_and_json_parses(spark):
    """Export -> re-read: payload is the exact envelope JSON (parseable
    by a real JSON parser, links in caller order), segments are
    byte-identical across exports, records url-sorted per shard."""
    import json

    from pyspark.sql import functions as F

    from commoncrawl_spark.sources.warc import (
        read_warc_records, wat_payload_col, wat_segments)

    rows = [(f"https://s.test/{i}",
             f"Title {i}",
             [f"https://a.test/{i}", f"https://b.test/{i % 3}"],
             i % 2)
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "url string, title string, links array<string>, shard int")
    p = df.select(
        "url", "shard",
        wat_payload_col(F.col("url"), F.col("title"),
                        F.col("links")).alias("payload"))
    segs1 = {r["shard"]: bytes(r["segment"])
             for r in wat_segments(p).collect()}
    segs2 = {r["shard"]: bytes(r["segment"])
             for r in wat_segments(p.repartition(5)).collect()}
    assert segs1 == segs2
    recs = read_warc_records(wat_segments(p), "segment").collect()
    assert all(r["error"] is None for r in recs)
    assert all(r["warc_type"] == "metadata" for r in recs)
    by_uri = {}
    for r in recs:
        env = json.loads(bytes(r["payload"]).decode())["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == r["target_uri"]
        html = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
        by_uri[r["target_uri"]] = (
            html["Head"]["Title"], [x["url"] for x in html["Links"]])
        assert all(x["path"] == "A@/href" for x in html["Links"])
    assert by_uri == {u: (t, ls) for u, t, ls, _ in rows}
    for sh in (0, 1):
        uris = [r["target_uri"] for r in
                sorted((x for x in recs if x["shard"] == sh),
                       key=lambda x: x["record_idx"])]
        assert uris == sorted(uris)
