"""Hot-domain skew demonstration for the politeness scheduler.

The reference corpus is 100% one host (theguardian.com — create_tasks.py:10),
i.e. maximal key skew: a naive ``Window.partitionBy(host)`` puts the ENTIRE
frontier in one partition and sorts it in one task. The engine's
``select_polite_batch`` salts the window key (``pmod(xxhash64(url_sha1), K)``)
so stage 1 runs K-wide, and stage 2 only ranks the <= K * budget survivors.

This script measures exactly that: an n_rows single-host frontier, top-B
selection with salt_buckets=1 (the naive plan) vs salt_buckets=32,
interleaved reps. Results land in skew_report.json and BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from commoncrawl_spark.operators.schedule import select_polite_batch  # noqa: E402
from commoncrawl_spark.session import get_spark  # noqa: E402

N_ROWS = int(os.environ.get("SKEW_ROWS", "16000000"))
BUDGET = int(os.environ.get("SKEW_BUDGET", "10000"))


def single_host_frontier(spark, n_rows: int):
    """100%-skew frontier: every URL on one host, distinct sha1-ish keys."""
    return (
        spark.range(n_rows, numPartitions=128)
        .select(
            F.lit("theguardian.com").alias("host"),
            F.sha1(F.col("id").cast("string")).alias("url_sha1"),
            (F.col("id") % 114).cast("int").alias("crawl_rank"),
            (F.col("id") % 10).cast("int").alias("page"),
            F.col("id").cast("int").alias("line_no"),
        )
    )


def main() -> None:
    spark = get_spark("skew_bench", shuffle_partitions=128)
    frontier = single_host_frontier(spark, N_ROWS).persist()
    frontier.count()

    def run(salt: int) -> float:
        t0 = time.monotonic()
        out = select_polite_batch(
            frontier, budget_per_host=BUDGET, salt_buckets=salt,
            priority_cols=("crawl_rank", "page", "line_no"),
        )
        out.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    reps = {1: [], 32: []}
    for salt in (32, 1, 32, 1, 32):  # interleaved; extra warm 32 first
        reps[salt].append(round(run(salt), 2))
        print(f"salt={salt}: {reps[salt][-1]}s", file=sys.stderr)

    best = {s: min(v) for s, v in reps.items()}
    report = {
        "n_rows": N_ROWS,
        "budget_per_host": BUDGET,
        "host_distribution": "100% single host (reference Guardian regime)",
        "seconds_naive_salt1": best[1],
        "seconds_salted_32": best[32],
        "speedup": round(best[1] / best[32], 2),
        "all_reps": {str(k): v for k, v in reps.items()},
    }
    with open(os.path.join(REPO, "skew_report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
