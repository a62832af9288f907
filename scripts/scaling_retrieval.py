"""N -> 4N scaling evidence for the RETRIEVAL family — the
ninth-session sibling of scripts/scaling_lm.py: the crawl path (0.96),
the dedup/graph/sketch and token-shuffle families all have measured
legs; this one covers the two CORPUS-SIZED retrieval workloads:

- ``bm25_scan``: the scan-path query (tokenize -> tf -> score ->
  bounded top-k) — what runs when no index exists;
- ``index_build``: tf index + doclen + Block-Max metadata, the
  index-once side of index-once/search-many. (Queries over the
  PERSISTED index are deliberately not a leg: their cost is bounded
  by |terms|*m + idspace/span by construction — the whole point of
  the pruning family — so at any corpus size they are
  fixed-overhead-dominated and a core-count ratio would measure the
  scheduler, not the engine.)

Method — identical to scripts/scaling_bench.py (the criterion's sandbox
stand-in): the same job on the same input at two core counts in separate
taskset-pinned processes, legs interleaved (the shared host drifts under
sustained load, so consecutive same-leg runs correlate), efficiency =
median(pair ratios) / 4, with the pure-CPU hardware ceiling printed next
to it so the engine's share of any loss is attributable.

Input: sf0.1 documents amplified deterministically in-plan (the
scaling_lm.py amplifier — raw sf0.1 text is 1.5 MB, which would measure
fixed overhead, not the operators). Writes
scaling_retrieval_report.json + a markdown row for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("RET_SCALE_FACTOR", "16"))
REPEAT = int(os.environ.get("RET_SCALE_REPEAT", "4"))
TERMS = ["join", "hash", "scan"]


def leg(cores: int) -> None:
    """Run inside a taskset-pinned child: time the two retrieval
    queries on the amplified corpus; print one JSON line."""
    import shutil
    import tempfile

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_lm import _task_metric_sums, amplified

    from commoncrawl_spark.operators.index import (
        bm25_search,
        build_block_max,
        build_doclen,
        build_tf_index,
    )
    from commoncrawl_spark.session import get_spark

    logdir = tempfile.mkdtemp(prefix=f"ccs_elog_ret_{cores}_")
    spark = get_spark("scaling-retrieval", cores=cores,
                      shuffle_partitions=64,
                      extra_conf={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.compress": "false",
                          "spark.eventLog.dir": logdir,
                      })

    def run_full(df):
        df.write.format("noop").mode("overwrite").save()

    def index_build(df):
        # the deepest index-build plan: Block-Max metadata consumes the
        # tf index AND doclen, so one write exercises tokenize -> tf
        # groupBy -> df/globals aggregates -> per-block score maxima.
        # with_dl rides the doc length on the postings, dropping the
        # postings-sized id-key exchange a doclen join would cost.
        return build_block_max(build_tf_index(df, with_dl=True),
                               build_doclen(df), block_span=4096)

    warm = amplified(spark, 2, 1)
    run_full(bm25_search(warm, TERMS, top_k=15))
    run_full(index_build(warm))

    amp = amplified(spark, FACTOR, REPEAT)
    out = {"cores": cores, "n_docs": amp.count()}
    t0_ms = time.time() * 1000
    t = time.monotonic()
    run_full(bm25_search(amp, TERMS, top_k=15))
    out["bm25_scan_s"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    run_full(index_build(amp))
    out["index_build_s"] = round(time.monotonic() - t, 3)
    t1_ms = time.time() * 1000
    out["timed_wall_s"] = out["bm25_scan_s"] + out["index_build_s"]
    spark.stop()
    time.sleep(1)
    out.update(_task_metric_sums(logdir, t0_ms, t1_ms))
    shutil.rmtree(logdir, ignore_errors=True)
    print(json.dumps(out))


def run_leg(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"))
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.abspath(__file__), "--leg", str(cores)]
    for attempt in (0, 1):
        try:
            out = subprocess.run(cmd, env=env, capture_output=True,
                                 text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"leg cores={cores} attempt {attempt} timed out",
                  file=sys.stderr)
            continue
        if out.returncode == 0 and out.stdout.strip():
            return json.loads(out.stdout.strip().splitlines()[-1])
        print(f"leg cores={cores} attempt {attempt} failed "
              f"(rc={out.returncode}); stderr tail:\n"
              + "\n".join(out.stderr.splitlines()[-12:]), file=sys.stderr)
    raise RuntimeError(f"leg cores={cores} failed twice")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import hardware_ceiling

    reps: dict[int, list[dict]] = {2: [], 8: []}
    for c in (8, 2, 8, 2, 8, 2):
        r = run_leg(c)
        reps[c].append(r)
        print(f"rep cores={c}: bm25_scan {r['bm25_scan_s']}s, "
              f"index_build {r['index_build_s']}s", file=sys.stderr)

    report: dict = {
        "input": SF_DIR, "factor": FACTOR, "repeat": REPEAT,
        "n_docs": reps[8][0]["n_docs"],
        "method": "interleaved pairs, median ratio, taskset-pinned legs",
    }
    ceil = hardware_ceiling(2, 8)
    report["cpu_ceiling_speedup_2_to_8"] = round(ceil, 2)

    def _med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    busy = {c: round(_med([r["sum_run_s"] / (c * r["timed_wall_s"])
                          for r in rs]), 3)
            for c, rs in reps.items()}
    infl = round(_med([a["sum_cpu_s"] / b["sum_cpu_s"]
                      for a, b in zip(reps[8], reps[2])]), 3)
    report["task_metrics"] = {
        "core_busy_fraction": busy,
        "cpu_inflation_8_vs_2": infl,
        "note": "busy ~1.0 both legs = no serial stage / no idle; "
                "inflation = shared-L3 single-socket contention, absent "
                "on a real multi-machine N->4N (tasks filtered to the "
                "timed window)",
    }
    rows = []
    for q in ("bm25_scan_s", "index_build_s"):
        ratios = sorted(a[q] / b[q] for a, b in zip(reps[2], reps[8]))
        med = ratios[len(ratios) // 2]
        name = q[:-2]
        report[name] = {
            "seconds": {str(c): [r[q] for r in rs]
                        for c, rs in reps.items()},
            "pair_ratios_2_to_8": [round(x, 3) for x in ratios],
            "median_speedup": round(med, 3),
            "efficiency": round(med / 4, 3),
            "engine_efficiency_vs_cpu_ceiling": round(med / ceil, 3),
            "contention_corrected_efficiency": round(med * infl / 4, 3),
        }
        rows.append((name, med))
    with open(os.path.join(REPO, "scaling_retrieval_report.json"),
              "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    print()
    print("| query | speedup 2->8 cores | raw efficiency | hw ceiling | "
          "engine eff vs ceiling |")
    print("|---|---|---|---|---|")
    for name, med in rows:
        print(f"| {name} | {med:.2f}x | {med / 4:.2f} | {ceil:.2f}x | "
              f"{med / ceil:.2f} |")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        leg(int(sys.argv[2]))
    else:
        main()
