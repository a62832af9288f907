"""Stage-by-stage timing of the crawl pipeline at one core count.

Usage: taskset -c 0-(N-1) python scripts/profile_stages.py N
Prints one JSON line with per-stage seconds so the 8-core and 32-core
legs can be diffed stage by stage.
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
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("BENCH_PAGE_FACTOR", "32")
os.environ.setdefault("BENCH_BODY_REPEAT", "40")

sys.path.insert(0, REPO)
import bench  # noqa: E402

bench.PAGE_FACTOR = int(os.environ["BENCH_PAGE_FACTOR"])
bench.BODY_REPEAT = int(os.environ["BENCH_BODY_REPEAT"])


def main() -> None:
    t: dict[str, float] = {}
    spark = get_spark(
        "profile", cores=CPUS, shuffle_partitions=4 * CPUS,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )

    t0 = time.monotonic()
    pages, cdx = bench.build_corpus(spark, SF_DIR)
    pages = pages.repartition(4 * CPUS, "url").persist()
    cdx = cdx.repartition(4 * CPUS).persist()
    n_pages = pages.count()
    cdx.count()
    t["build_persist"] = time.monotonic() - t0

    from commoncrawl_spark.operators.dedup import best_capture_per_url
    from commoncrawl_spark.operators.extraction import extract_articles, split_articles

    t0 = time.monotonic()
    best = best_capture_per_url(cdx, arrival_cols=("crawl", "page", "line_no"))
    best = best.persist()
    best.count()
    t["dedup"] = time.monotonic() - t0

    t0 = time.monotonic()
    fetch = (
        best.filter(F.col("status") == "200")
        .select("url")
        .join(pages.select("url", "html"), "url")
    ).persist()
    n_fetch = fetch.count()
    t["fetch_join"] = time.monotonic() - t0

    t0 = time.monotonic()
    ok, _ = split_articles(extract_articles(fetch))
    n = ok.count()
    t["extract"] = time.monotonic() - t0

    # extraction again without the persisted input (as bench runs it fused)
    best.unpersist(); fetch.unpersist()
    t0 = time.monotonic()
    crawl_s, n2 = bench.bench_crawl(spark, pages, cdx)
    t["full_fused"] = crawl_s

    print(json.dumps({
        "cpus": CPUS, "n_pages": n_pages, "n_fetch": n_fetch, "n_urls": n,
        "stages": {k: round(v, 2) for k, v in t.items()},
    }), file=sys.__stdout__)


if __name__ == "__main__":
    main()
