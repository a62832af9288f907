"""N -> 4N scaling evidence for the TOKEN-SHUFFLE family (lm_bigram +
tfidf_terms) — VERDICT r02 #9: the crawl path's 0.96 efficiency is
proven (scaling_report.json); this leg shows the map-side-partial
token/pair aggregate shapes scale too.

Method — identical to scripts/scaling_bench.py (the criterion's sandbox
stand-in): the same job on the same input at two core counts in separate
taskset-pinned processes, legs interleaved (the shared host drifts under
sustained load, so consecutive same-leg runs correlate), efficiency =
median(pair ratios) / 4, with the pure-CPU hardware ceiling printed next
to it so the engine's share of any loss is attributable.

Input: sf0.1 documents amplified deterministically in-plan (each doc
replicated FACTOR times with distinct ids, text repeated REPEAT times) —
the raw sf0.1 text is 1.5 MB, which would measure fixed overhead, not
the operators. Writes scaling_lm_report.json + a markdown row for
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("LM_SCALE_FACTOR", "16"))
REPEAT = int(os.environ.get("LM_SCALE_REPEAT", "4"))


def amplified(spark, factor: int, repeat: int, parts: int = 64):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    # the raw sf0.1 parquet is 1.5 MB = ONE input split, so without this
    # the amplify+tokenize scan stage is a single task at ANY core count
    # and the 2-core/8-core legs measure the same serial stage (observed:
    # 1.8x "speedup" 2->8). Repartitioning the SMALL base table (5k rows)
    # before the explode spreads the generated text across a fixed
    # partition count — same plan at both parallelism levels, cores only
    # control concurrency — the sandbox stand-in for a real input's
    # thousands of splits, with no shuffle of the amplified text itself.
    return (
        d.repartition(parts, "doc_id")
        .select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_k"))
        .select(
            (F.col("doc_id") * factor + F.col("_k")).alias("doc_id"),
            F.concat_ws(
                " ", F.array_repeat(F.col("text"), repeat)).alias("text"),
        )
    )


def _task_metric_sums(logdir: str, t0_ms: float, t1_ms: float) -> dict:
    """Aggregate TaskEnd metrics from an (uncompressed) event log for
    tasks LAUNCHED inside the timed window [t0_ms, t1_ms] — warmup and
    the n_docs count() stay out, so busy fraction and CPU totals
    describe exactly the timed queries."""
    import glob

    run = cpu = gc = 0.0
    files = [p for p in glob.glob(f"{logdir}/**", recursive=True)
             if os.path.isfile(p)]
    for f in files:
        for line in open(f, errors="ignore"):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if not isinstance(ev, dict) or \
                    ev.get("Event") != "SparkListenerTaskEnd":
                continue
            info = ev.get("Task Info") or {}
            if not (t0_ms <= info.get("Launch Time", 0) <= t1_ms):
                continue
            m = ev.get("Task Metrics") or {}
            run += m.get("Executor Run Time", 0)
            cpu += m.get("Executor CPU Time", 0) / 1e6
            gc += m.get("JVM GC Time", 0)
    return {"sum_run_s": round(run / 1000, 1),
            "sum_cpu_s": round(cpu / 1000, 1),
            "sum_gc_s": round(gc / 1000, 1)}


def leg(cores: int) -> None:
    """Run inside a taskset-pinned child: time the two token-family
    queries on the amplified corpus; print one JSON line."""
    import shutil
    import tempfile

    sys.path.insert(0, REPO)
    from commoncrawl_spark.operators.analytics import tfidf_top_terms
    from commoncrawl_spark.operators.lm import bigram_logprob_scores
    from commoncrawl_spark.session import get_spark

    logdir = tempfile.mkdtemp(prefix=f"ccs_elog_{cores}_")
    # fixed shuffle partition count at BOTH legs: the plan is identical,
    # the core count only changes how many tasks run concurrently —
    # matching the criterion's "same job at two cluster sizes"
    spark = get_spark("scaling-lm", cores=cores, shuffle_partitions=64,
                      extra_conf={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.compress": "false",
                          "spark.eventLog.dir": logdir,
                      })
    def run_full(df):
        # noop sink: executes the FULL plan and consumes every column —
        # count() lets Catalyst prune the scoring expressions (measured
        # 20x too fast for lm_bigram), which would time the wrong plan
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on a small slice so the timed run measures the
    # operators, not classloading
    warm = amplified(spark, 2, 1)
    run_full(bigram_logprob_scores(warm))
    run_full(tfidf_top_terms(warm, k=3))

    amp = amplified(spark, FACTOR, REPEAT)
    out = {"cores": cores, "n_docs": amp.count()}
    t0_ms = time.time() * 1000
    t = time.monotonic()
    run_full(bigram_logprob_scores(amp))
    out["lm_bigram_s"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    run_full(tfidf_top_terms(amp, k=3))
    out["tfidf_terms_s"] = round(time.monotonic() - t, 3)
    t1_ms = time.time() * 1000
    out["timed_wall_s"] = out["lm_bigram_s"] + out["tfidf_terms_s"]
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
            # a wedged leg is a failed attempt, not a benchmark abort
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
        print(f"rep cores={c}: lm_bigram {r['lm_bigram_s']}s, "
              f"tfidf {r['tfidf_terms_s']}s", file=sys.stderr)

    report: dict = {
        "input": SF_DIR, "factor": FACTOR, "repeat": REPEAT,
        "n_docs": reps[8][0]["n_docs"],
        "method": "interleaved pairs, median ratio, taskset-pinned legs",
    }
    ceil = hardware_ceiling(2, 8)
    report["cpu_ceiling_speedup_2_to_8"] = round(ceil, 2)

    # where does efficiency go? Task metrics answer it: busy_fraction
    # ~1.0 at both legs means the ENGINE kept every core saturated (no
    # serial stage, no scheduling gaps); cpu_inflation > 1 means each
    # task burned MORE CPU at higher concurrency — single-socket
    # shared-L3/DRAM contention on this sandbox host (all 32 cores
    # share one L3; stalls are charged as CPU time). A real N->4N adds
    # 4x SOCKETS with their own caches, so this term does not exist on
    # the cluster the criterion describes; contention_corrected = what
    # the speedup would be with per-task work held constant.
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
    for q in ("lm_bigram_s", "tfidf_terms_s"):
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
    with open(os.path.join(REPO, "scaling_lm_report.json"), "w") as fh:
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
