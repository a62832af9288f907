"""Minimal repro: time ONLY the extraction UDF stage at one core count.

Usage: python scripts/profile_extract.py N [conf overrides k=v ...]
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
    spark = get_spark("profile_extract", cores=CPUS,
                      shuffle_partitions=4 * CPUS, extra_conf=extra)
    pages, _ = bench.build_corpus(spark, SF_DIR)
    pages = pages.repartition(4 * CPUS, "url").persist()
    n = pages.count()

    from commoncrawl_spark.operators.extraction import extract_articles, split_articles

    # warm (forks workers, JIT)
    ok, _f = split_articles(extract_articles(pages.limit(2000)))
    ok.count()

    t0 = time.monotonic()
    ok, _f = split_articles(extract_articles(pages))
    got = ok.count()
    dt = time.monotonic() - t0
    print(json.dumps({"cpus": CPUS, "n": n, "extracted": got,
                      "extract_s": round(dt, 2),
                      "pages_per_s": round(n / dt, 1),
                      "extra": extra}), file=sys.__stdout__)


if __name__ == "__main__":
    main()
