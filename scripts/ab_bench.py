"""Same-moment engine A/B — the drift-vs-regression adjudicator.

Cross-ROUND bench ratios are unreliable on this shared host (condition
swings up to ~2.5x between rounds on identical code), so apparent
regressions in BENCH_rN vs BENCH_r{N-1} must be re-measured with both
engines side-by-side: check each older engine out into a throwaway
git worktree, run the SAME queries from every engine interleaved on
the same quiet host minutes apart, and compare engine-vs-engine under
identical conditions. Round 4 proved 17 apparent regressions were all
host drift this way; this script makes the protocol repeatable.

Usage:
    python scripts/ab_bench.py \
        --engine r03=/tmp/eng_r03 --engine r05=/root/repo \
        --reps 2 -- query1 query2 ...

Each (engine, rep) leg is an isolated subprocess on a fresh
SparkSession (local[32], the bench shape); legs are interleaved
forward then reversed (A B C / C B A ...) so slow host windows hit
engines symmetrically. Per query the reported number is the min
across reps (bench.py's best-of-2 policy); each query also best-of-2s
inside a leg when >= 1 s. Writes ab_bench_report.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def leg(engine_dir: str, queries: list[str]) -> None:
    sys.path.insert(0, engine_dir)
    os.chdir(engine_dir)
    import __spark_entry__ as e
    from commoncrawl_spark.session import get_spark

    spark = get_spark("ab-bench", cores=CPUS, shuffle_partitions=CPUS)
    qs = e.queries()

    def run(name: str) -> None:
        qs[name](spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()

    # JVM/codegen warmup on the first query, untimed
    run(queries[0])
    out: dict[str, float] = {}
    for name in queries:
        t0 = time.monotonic()
        run(name)
        dt = time.monotonic() - t0
        if dt >= 1.0:  # bench.py's best-of-2 floor
            t0 = time.monotonic()
            run(name)
            dt = min(dt, time.monotonic() - t0)
        out[name] = round(dt, 3)
    spark.stop()
    print("AB_LEG " + json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", action="append", required=True,
                    metavar="LABEL=DIR")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--leg", help="internal: run one leg in DIR")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if args.leg:
        leg(args.leg, args.queries)
        return

    engines = [tuple(e.split("=", 1)) for e in args.engine]
    results: dict[str, list[dict[str, float]]] = {lb: [] for lb, _ in engines}
    order = list(engines)
    for rep in range(args.reps):
        for lb, d in order:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--engine", "x=x", "--leg", d] + args.queries
            t = time.monotonic()
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600,
                               env=dict(os.environ,
                                        SPARK_GRAFT_SF_DIR=SF_DIR))
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("AB_LEG ")]
            if not line:
                print(f"leg {lb} rep {rep} FAILED rc={p.returncode}\n"
                      + "\n".join(p.stderr.splitlines()[-10:]),
                      file=sys.stderr)
                continue
            r = json.loads(line[-1][len("AB_LEG "):])
            results[lb].append(r)
            print(f"rep {rep} {lb}: {round(time.monotonic() - t, 1)}s "
                  f"wall — {r}", file=sys.stderr)
        # rotate the starting engine each rep (not just reverse): with
        # a plain reversal the first label owns the first-after-idle
        # slot in every run, which reads as a systematic engine edge
        # when the host degrades under sustained load
        order = order[1:] + order[:1]

    best = {lb: {q: min(r[q] for r in rs) for q in args.queries}
            for lb, rs in results.items() if rs}
    report = {
        "sf": SF_DIR, "cpus": CPUS, "reps": args.reps,
        "method": "interleaved engine legs (forward/reverse), "
                  "fresh session per leg, per-query min across reps, "
                  "in-leg best-of-2 over 1 s",
        "best": best,
        "raw": {lb: rs for lb, rs in results.items()},
    }
    labels = [lb for lb, _ in engines]
    if len(labels) >= 2 and all(lb in best for lb in labels):
        newest = labels[-1]
        report["ratios_vs_" + labels[0]] = {
            q: round(best[newest][q] / best[labels[0]][q], 3)
            for q in args.queries}
    with open(os.path.join(REPO, "ab_bench_report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report["best"], indent=2))


if __name__ == "__main__":
    main()
