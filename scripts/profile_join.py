"""Decompose the crawl stage: scan-only, join-only, join+extract.

Usage: taskset -c 0-(N-1) python scripts/profile_join.py N [k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from commoncrawl_spark.session import get_spark  # noqa: E402

CPUS = int(sys.argv[1])
extra = dict(kv.split("=", 1) for kv in sys.argv[2:])
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("BENCH_PAGE_FACTOR", "32")
os.environ.setdefault("BENCH_BODY_REPEAT", "40")

import bench  # noqa: E402

bench.PAGE_FACTOR = int(os.environ["BENCH_PAGE_FACTOR"])
bench.BODY_REPEAT = int(os.environ["BENCH_BODY_REPEAT"])


def main() -> None:
    conf = {"spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.warehouse.dir": "/tmp/ccspark-warehouse"}
    conf.update(extra)
    spark = get_spark("join_prof", cores=CPUS, shuffle_partitions=4 * CPUS,
                      extra_conf=conf)
    pages, cdx = bench.build_corpus(spark, SF_DIR)
    pages, cdx = bench.materialize_tables(spark, pages, cdx)
    pages.count(); cdx.count()

    from commoncrawl_spark.operators.dedup import best_capture_per_url
    from commoncrawl_spark.operators.extraction import extract_articles, split_articles

    t = {}

    t0 = time.monotonic()
    pages.select(F.sum(F.length("html"))).collect()
    t["scan_html"] = time.monotonic() - t0

    t0 = time.monotonic()
    best = best_capture_per_url(cdx, arrival_cols=("crawl", "page", "line_no"))
    best.filter(F.col("status") == "200").select("url").write.format("noop").mode("overwrite").save()
    t["dedup_only"] = time.monotonic() - t0

    t0 = time.monotonic()
    best = best_capture_per_url(cdx, arrival_cols=("crawl", "page", "line_no"))
    fetch = (best.filter(F.col("status") == "200").select("url")
             .join(pages.select("url", "html"), "url"))
    fetch.select(F.sum(F.length("html"))).collect()
    t["dedup_join"] = time.monotonic() - t0

    t0 = time.monotonic()
    crawl_s, n = bench.bench_crawl(spark, pages, cdx)
    t["full"] = crawl_s

    print(json.dumps({"cpus": CPUS,
                      "t": {k: round(v, 2) for k, v in t.items()}}),
          file=sys.__stdout__)


if __name__ == "__main__":
    main()
