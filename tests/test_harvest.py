"""Entry point #1 end-to-end: index fan-out -> transport fetch -> JSONL
parse -> fail-fast index gate -> dedup fold (plans/harvest.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.plans.harvest import (
    harvest_indexes,
    merge_harvested,
    parse_cdx_pages,
)
from commoncrawl_spark.sources.transport import HttpRangeTransport


def _rec(url, status="200", ts="20240101000000", length="100", mime="text/html"):
    return json.dumps({
        "urlkey": "test," + url, "timestamp": ts, "url": url, "mime": mime,
        "mime-detected": mime, "status": status, "digest": "D", "length": length,
        "offset": "0", "filename": "seg.warc.gz",
    })


# two indexes; B's page 1 errors -> B fails wholesale. A's two pages
# carry a duplicate URL whose SECOND capture wins (status 200 beats 404)
# and one malformed line that must be skipped.
PAGES = {
    ("CC-MAIN-2024-10", 0): "\n".join([
        _rec("https://x.test/a", status="404"),
        _rec("https://x.test/b"),
        "NOT-JSON-AT-ALL {",
    ]),
    ("CC-MAIN-2024-10", 1): "\n".join([
        _rec("https://x.test/a", status="200", ts="20240202000000"),
    ]),
    ("CC-MAIN-2024-18", 0): _rec("https://x.test/c"),
    # ("CC-MAIN-2024-18", 1) -> opener raises
}


def _make_opener():
    # a closure (not a module-level function): cloudpickle ships it by
    # value, so executors need no tests/ module on their path
    pages = dict(PAGES)

    def opener(url, offset, length):
        # task urls look like {api}/{index}-index?url={target}&...&page={p}
        index = url.split("/")[3].split("-index")[0]
        page = int(url.rsplit("page=", 1)[-1])
        if (index, page) not in pages:
            raise OSError("boom")
        return pages[(index, page)].encode()

    return opener


@pytest.fixture()
def indexes(spark):
    return spark.createDataFrame(
        [("CC-MAIN-2024-10", 2), ("CC-MAIN-2024-18", 2)],
        "index string, pages int",
    )


@pytest.mark.spark
def test_harvest_fail_fast_and_parse(spark, indexes):
    recs, failed = harvest_indexes(
        indexes, HttpRangeTransport(opener=_make_opener()), "x.test/*"
    )
    assert [r["index"] for r in failed.collect()] == ["CC-MAIN-2024-18"]
    got = {(r["index"], r["page"], r["line_no"], r["url"], r["status"])
           for r in recs.collect()}
    # the malformed line is dropped; index B contributes NOTHING
    assert got == {
        ("CC-MAIN-2024-10", 0, 0, "https://x.test/a", "404"),
        ("CC-MAIN-2024-10", 0, 1, "https://x.test/b", "200"),
        ("CC-MAIN-2024-10", 1, 0, "https://x.test/a", "200"),
    }


@pytest.mark.spark
def test_harvest_merge_fold_picks_better_capture(spark, indexes):
    recs, _ = harvest_indexes(
        indexes, HttpRangeTransport(opener=_make_opener()), "x.test/*"
    )
    best = {r["url"]: (r["status"], r["timestamp"])
            for r in merge_harvested(recs).collect()}
    assert best["https://x.test/a"] == ("200", "20240202000000")  # 200 beats 404
    assert best["https://x.test/b"] == ("200", "20240101000000")


@pytest.mark.spark
def test_parse_cdx_pages_is_jvm_only(spark):
    df = spark.createDataFrame(
        [("CC-MAIN-2024-10", 0, _rec("https://x.test/a").encode())],
        "index string, page int, html binary",
    )
    plan = parse_cdx_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert parse_cdx_pages(df).count() == 1
