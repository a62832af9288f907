"""N -> 4N scaling evidence for the GRAPH-WALK family (pagerank +
connected components) — the fourth leg of the criterion's evidence,
after the crawl path (scaling_report.json), the token-shuffle LM/tfidf
family (scaling_lm_report.json), and the dedup signature/candidate
joins (scaling_dedup_report.json). These are the iterative node-key
exchange shapes: per-iteration join + map-side-partial aggregate on a
slim (node, double) rank vector, and min-label pointer doubling with
checkpoint-truncated lineage.

Method — identical to the other three legs: the same job on the same
input at two core counts in separate taskset-pinned processes, legs
interleaved (the shared host drifts under sustained load, so
consecutive same-leg runs correlate), efficiency = median(pair ratios)
/ 4, with the pure-CPU hardware ceiling printed next to it.

Input: sf0.1 documents amplified deterministically in-plan into a
skewed host graph — each doc replicated FACTOR times, two non-invertible
out-edges per replica over a node space of n_docs*FACTOR/10 hosts (the
same quadratic/affine-fold construction as the host_pagerank query, so
in-degree is genuinely skewed and dangling mass exists). PageRank runs
ITERS fixed iterations; components run to fixpoint on the same edges.
Writes scaling_graph_report.json + a markdown row for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("GRAPH_SCALE_FACTOR", "64"))
ITERS = int(os.environ.get("GRAPH_SCALE_ITERS", "8"))
# interleaved (8, 2) pairs; the amplified-factor evidence leg (r3
# verdict stretch: show per-round barriers amortizing as each round
# carries more data) runs longer per rep, so reps are tunable
REPS = int(os.environ.get("GRAPH_SCALE_REPS", "3"))


def amplified_edges(spark, factor: int, parts: int = 64):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    n_nodes = d.count() * factor // 10
    return (
        d.repartition(parts, "doc_id")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_k"))
        .select(((F.col("doc_id") * factor + F.col("_k")) % n_nodes)
                .alias("src"))
        .select(
            "src",
            F.explode(F.array(
                (F.col("src") * F.col("src") + 1) % n_nodes,
                (F.col("src") * 17 + 3) % (n_nodes // 2),
            )).alias("dst"),
        )
    )


def leg(cores: int) -> None:
    """Run inside a taskset-pinned child: time the two graph-family
    queries on the amplified edge set; print one JSON line."""
    import shutil
    import tempfile

    sys.path.insert(0, REPO)
    from commoncrawl_spark.operators.graph import (
        connected_components,
        pagerank,
    )
    from commoncrawl_spark.session import get_spark

    logdir = tempfile.mkdtemp(prefix=f"ccs_elog_{cores}_")
    spark = get_spark("scaling-graph", cores=cores, shuffle_partitions=64,
                      extra_conf={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.compress": "false",
                          "spark.eventLog.dir": logdir,
                      })

    def run_full(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on a small slice
    warm = amplified_edges(spark, 2)
    run_full(pagerank(warm, iters=2))
    run_full(connected_components(warm, a_col="src", b_col="dst"))

    amp = amplified_edges(spark, FACTOR).localCheckpoint(eager=True)
    out = {"cores": cores, "n_edges": amp.count()}
    t0_ms = time.time() * 1000
    t = time.monotonic()
    run_full(pagerank(amp, iters=ITERS))
    out["pagerank_s"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    run_full(connected_components(amp, a_col="src", b_col="dst"))
    out["components_s"] = round(time.monotonic() - t, 3)
    t1_ms = time.time() * 1000
    out["timed_wall_s"] = out["pagerank_s"] + out["components_s"]
    spark.stop()
    time.sleep(1)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_lm import _task_metric_sums

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
    for c in (8, 2) * REPS:
        r = run_leg(c)
        reps[c].append(r)
        print(f"rep cores={c}: pagerank {r['pagerank_s']}s, "
              f"components {r['components_s']}s", file=sys.stderr)

    report: dict = {
        "input": SF_DIR, "factor": FACTOR, "iters": ITERS,
        "n_edges": reps[8][0]["n_edges"],
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
        "note": "busy < 1 and FALLING at 8 cores = per-round "
                "scheduling/checkpoint barriers (fixed per-iteration "
                "cost; idle cores wait at each round boundary) dominate "
                "at sandbox round sizes and amortize when a round "
                "carries real data volume; inflation = shared-L3 "
                "single-socket contention, absent on a real "
                "multi-machine N->4N (tasks filtered to the timed "
                "window)",
    }
    rows = []
    for q in ("pagerank_s", "components_s"):
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
    out_name = ("scaling_graph_report.json" if FACTOR == 512
                else f"scaling_graph_report_f{FACTOR}.json")
    with open(os.path.join(REPO, out_name), "w") as fh:
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
