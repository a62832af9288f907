"""N -> 4N scaling evidence for the DEDUP family (near_dedup_pipeline +
duplicate_spans) — closing the third leg of the criterion's evidence:
the crawl path (scaling_report.json) and the token-shuffle LM/tfidf
family (scaling_lm_report.json) are proven; this leg shows the
signature/candidate-join shapes scale too: MinHash folds + LSH
band-bucket self-join + Jaccard verification + id anti-join
(drop_near_duplicates), and the gram-count + AQE-joinable
fingerprint shuffle (duplicate_span_stats).

Method — identical to scripts/scaling_bench.py and scaling_lm.py: the
same job on the same input at two core counts in separate
taskset-pinned processes, legs interleaved (the shared host drifts
under sustained load, so consecutive same-leg runs correlate),
efficiency = median(pair ratios) / 4, with the pure-CPU hardware
ceiling printed next to it so the engine's share of any loss is
attributable.

Input: sf0.1 documents amplified deterministically in-plan (each doc
replicated FACTOR times with distinct ids and a per-replica salt word
appended so replicas of one base doc are NEAR-duplicates, not byte
twins — the LSH buckets collide within a replica group and the Jaccard
verification has real work; groups never collide across base docs).
Writes scaling_dedup_report.json + a markdown row for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("DEDUP_SCALE_FACTOR", "8"))
REPEAT = int(os.environ.get("DEDUP_SCALE_REPEAT", "2"))


def amplified(spark, factor: int, repeat: int, parts: int = 64):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    # repartition the SMALL base table before the explode so the
    # generated text spreads across a fixed partition count — the plan
    # is identical at both legs, cores only control concurrency (see
    # scaling_lm.amplified for the single-input-split failure mode this
    # avoids). The per-replica salt word keeps replicas near- (not
    # byte-) identical, so the Jaccard stage verifies real pairs.
    return (
        d.repartition(parts, "doc_id")
        .select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_k"))
        .select(
            (F.col("doc_id") * factor + F.col("_k")).alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat_ws(" ", F.array_repeat(F.col("text"), repeat)),
                F.concat(F.lit("salt"), F.col("_k").cast("string")),
            ).alias("text"),
        )
    )


def leg(cores: int) -> None:
    """Run inside a taskset-pinned child: time the two dedup-family
    queries on the amplified corpus; print one JSON line."""
    import shutil
    import tempfile

    sys.path.insert(0, REPO)
    from commoncrawl_spark.operators.text_dedup import (
        drop_near_duplicates,
        duplicate_span_stats,
    )
    from commoncrawl_spark.session import get_spark

    logdir = tempfile.mkdtemp(prefix=f"ccs_elog_{cores}_")
    spark = get_spark("scaling-dedup", cores=cores, shuffle_partitions=64,
                      extra_conf={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.compress": "false",
                          "spark.eventLog.dir": logdir,
                      })

    def run_full(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on a small slice
    warm = amplified(spark, 2, 1)
    run_full(drop_near_duplicates(warm))
    run_full(duplicate_span_stats(warm))

    amp = amplified(spark, FACTOR, REPEAT)
    out = {"cores": cores, "n_docs": amp.count()}
    t0_ms = time.time() * 1000
    t = time.monotonic()
    run_full(drop_near_duplicates(amp))
    out["near_dedup_s"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    run_full(duplicate_span_stats(amp))
    out["duplicate_spans_s"] = round(time.monotonic() - t, 3)
    t1_ms = time.time() * 1000
    out["timed_wall_s"] = out["near_dedup_s"] + out["duplicate_spans_s"]
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
        print(f"rep cores={c}: near_dedup {r['near_dedup_s']}s, "
              f"duplicate_spans {r['duplicate_spans_s']}s", file=sys.stderr)

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
    for q in ("near_dedup_s", "duplicate_spans_s"):
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
    with open(os.path.join(REPO, "scaling_dedup_report.json"), "w") as fh:
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
