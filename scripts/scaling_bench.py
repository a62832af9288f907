"""Two-cluster-size scaling evidence — the sandbox stand-in for the north
rule's "N vs 4N executors" criterion.

Method: the identical crawl job on the identical input at two core
counts, in separate processes; efficiency = (throughput_4N / throughput_N) / 4.

This box (32 shared vCPUs) does NOT deliver 32x one-core capacity: a
pure-CPU calibration loop (no Spark, no Python forking overhead — just
arithmetic in N processes) measures how much per-core speed degrades as
cores saturate. The report therefore contains:
  - the primary pair N=2 vs 4N=8 (hardware ceiling ~0.97 — a clean read
    of the ENGINE's scaling), and
  - the saturated pair N=8 vs 4N=32, with the measured hardware ceiling
    printed next to it so the engine's share of the loss is attributable.

Writes scaling_report.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAGE_FACTOR = os.environ.get("BENCH_PAGE_FACTOR", "64")
BODY_REPEAT = os.environ.get("BENCH_BODY_REPEAT", "40")


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _extract_many(k: int) -> int:
    sys.path.insert(0, REPO)
    from commoncrawl_spark.fixtures import _article_html, _warc_wrap
    from commoncrawl_spark.functions.extract import extract_from_warc_bytes
    import random

    html = _article_html(random.Random(1), 1, True)
    blob = _warc_wrap(html + ("<p>" + " ".join(["word"] * 40) + "</p>") * 40,
                      "https://x.test/a", "20240101000000", "utf-8", True)
    for _ in range(k):
        extract_from_warc_bytes(blob)
    return k


def workload_ceiling(n_lo: int, n_hi: int, pages: int = 12000) -> float:
    """Achievable throughput ratio hi/lo for THE EXTRACTION WORKLOAD with
    raw multiprocessing (no Spark, no Arrow): the memory-allocation-heavy
    parse scales sublinearly on this shared box regardless of engine."""
    def run(procs: int) -> float:
        with mp.Pool(procs) as p:
            t = time.monotonic()
            p.map(_extract_many, [pages // procs] * procs)
            return time.monotonic() - t

    return run(n_lo) / run(n_hi)


def hardware_ceiling(n_lo: int, n_hi: int, work: int = 40_000_000) -> float:
    """Max achievable throughput ratio hi/lo for CPU-bound work on this
    machine: fixed work per process, so ideal ratio = time_lo / time_hi = 1;
    aggregate ceiling = (n_hi / n_lo) * (t_lo / t_hi)."""
    def run(procs: int) -> float:
        with mp.Pool(procs) as p:
            t = time.monotonic()
            p.map(_spin, [work] * procs)
            return time.monotonic() - t

    t_lo, t_hi = run(n_lo), run(n_hi)
    return (n_hi / n_lo) * (t_lo / t_hi)


def run_bench(cpus: int) -> dict:
    """Run bench.py PINNED to exactly `cpus` CPUs (taskset over the whole
    process tree: JVM task threads AND Python workers share the budget).
    Without pinning, local[K] leaks past K cores — the K JVM task threads
    plus K Python UDF workers land on 2K machine cores, which silently
    inflates the small-N leg and wrecks the efficiency read."""
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_PAGE_FACTOR=PAGE_FACTOR,
        BENCH_BODY_REPEAT=BODY_REPEAT,
        BENCH_QUERIES="crawl_only",
        BENCH_NO_BROADCAST="1",
        # 24g measured best: a 64g ParallelGC heap made full collections
        # long, and -Xms-pinned heaps paid first-touch faults mid-run
        SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"),
    )
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "bench.py")]
    for attempt in (0, 1):  # one retry: shared-host legs fail transiently
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=3600)
        if out.returncode == 0 and out.stdout.strip():
            return json.loads(out.stdout.strip().splitlines()[-1])
        print(f"leg cores={cpus} attempt {attempt} failed "
              f"(rc={out.returncode}); stderr tail:\n"
              + "\n".join(out.stderr.splitlines()[-15:]), file=sys.stderr)
    raise RuntimeError(f"bench leg cores={cpus} failed twice")


def main() -> None:
    # Interleaved reps: this shared host drifts (sustained-load throttling),
    # so consecutive same-leg runs correlate. Alternate the legs and pair
    # adjacent runs; the reported ratio is the median of per-pair ratios,
    # with every raw rep printed for transparency.
    reps: dict[int, list[dict]] = {2: [], 8: [], 32: []}
    for c in (8, 2, 32, 8, 2, 8, 2):
        r = run_bench(c)
        reps[c].append(r)
        print(f"rep cores={c}: {r['urls_per_sec']} urls/s "
              f"({r['queries']['crawl_pipeline']}s)", file=sys.stderr)
    pair_ratios = [b["urls_per_sec"] / a["urls_per_sec"]
                   for a, b in zip(reps[2], reps[8])]
    pair_ratios.sort()
    med_ratio = pair_ratios[len(pair_ratios) // 2]

    def best(c):
        return max(reps[c], key=lambda r: r["urls_per_sec"])

    results = {2: best(2), 8: best(8), 32: best(32)}
    results_ratio_2_8 = med_ratio
    ceil_2_8 = hardware_ceiling(2, 8)
    ceil_8_32 = hardware_ceiling(8, 32)
    wceil_2_8 = workload_ceiling(2, 8)

    t = {c: results[c]["urls_per_sec"] for c in results}
    eff_2_8 = results_ratio_2_8 / 4
    eff_8_32 = (t[32] / t[8]) / 4
    report = {
        "input": SF_DIR,
        "n_pages": results[8]["n_pages"],
        "page_factor": int(PAGE_FACTOR),
        "body_repeat": int(BODY_REPEAT),
        "urls_per_sec": {str(c): t[c] for c in t},
        "all_reps_urls_per_sec": {
            str(c): [r["urls_per_sec"] for r in rs] for c, rs in reps.items()
        },
        "pair_ratios_2_to_8": [round(x, 3) for x in pair_ratios],
        "primary_pair": {
            "N": 2, "4N": 8,
            "efficiency": round(eff_2_8, 3),
            "cpu_ceiling_speedup": round(ceil_2_8, 2),
            "workload_ceiling_speedup_raw_mp": round(wceil_2_8, 2),
            "engine_efficiency_vs_cpu_ceiling": round(results_ratio_2_8 / ceil_2_8, 3),
            "engine_speedup_vs_raw_mp_ceiling": round(results_ratio_2_8 / wceil_2_8, 3),
        },
        "saturated_pair": {
            "N": 8, "4N": 32,
            "efficiency": round(eff_8_32, 3),
            "cpu_ceiling_speedup": round(ceil_8_32, 2),
            "engine_efficiency_vs_cpu_ceiling": round((t[32] / t[8]) / ceil_8_32, 3),
        },
        "crawl_seconds": {str(c): results[c]["queries"]["crawl_pipeline"]
                          for c in results},
    }
    with open(os.path.join(REPO, "scaling_report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    print()
    print("| cores | URLs/sec | speedup | raw efficiency | hw ceiling | engine eff vs ceiling |")
    print("|---|---|---|---|---|---|")
    print(f"| 2 (N) | {t[2]} | 1.00 | — | — | — |")
    print(f"| 8 (4N) | {t[8]} | {results_ratio_2_8:.2f} | {eff_2_8:.2f} | "
          f"{ceil_2_8:.2f}x | {results_ratio_2_8 / ceil_2_8:.2f} |")
    print(f"| 32 (16N) | {t[32]} | {t[32] / t[2]:.2f} | {eff_8_32:.2f} (vs 8) | "
          f"{ceil_8_32:.2f}x (vs 8) | {(t[32] / t[8]) / ceil_8_32:.2f} |")


if __name__ == "__main__":
    main()
