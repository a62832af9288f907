"""Fused crawl pipeline with event logging; prints per-stage durations.

Usage: taskset -c 0-(N-1) python scripts/profile_fused.py N [k=v ...]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from commoncrawl_spark.session import get_spark  # noqa: E402

CPUS = int(sys.argv[1])
extra = dict(kv.split("=", 1) for kv in sys.argv[2:])
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("BENCH_PAGE_FACTOR", "32")
os.environ.setdefault("BENCH_BODY_REPEAT", "40")

import bench  # noqa: E402

bench.PAGE_FACTOR = int(os.environ["BENCH_PAGE_FACTOR"])
bench.BODY_REPEAT = int(os.environ["BENCH_BODY_REPEAT"])

EVDIR = f"/tmp/spark-events-{CPUS}"


def main() -> None:
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    conf = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.warehouse.dir": "/tmp/ccspark-warehouse"}
    conf.update(extra)
    spark = get_spark("fused", cores=CPUS, shuffle_partitions=4 * CPUS,
                      extra_conf=conf)
    pages, cdx = bench.build_corpus(spark, SF_DIR)
    pages, cdx = bench.materialize_tables(spark, pages, cdx)
    pages.count(); cdx.count()

    t0 = time.monotonic()
    crawl_s, n = bench.bench_crawl(spark, pages, cdx)
    total = time.monotonic() - t0
    spark.stop()
    time.sleep(1)

    stages = []
    files = [f for f in glob.glob(f"{EVDIR}/**/*", recursive=True)
             if os.path.isfile(f)]
    for f in files:
        for line in open(f, errors="ignore"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if isinstance(ev, dict) and ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                stages.append((si["Stage ID"], round(dur, 2), si["Number of Tasks"],
                               si["Stage Name"].split("\n")[0][:70]))
    stages.sort()
    out = {"cpus": CPUS, "crawl_s": round(crawl_s, 2), "total_s": round(total, 2),
           "n": n, "stages": stages[-25:]}
    print(json.dumps(out, indent=1), file=sys.__stdout__)


if __name__ == "__main__":
    main()
