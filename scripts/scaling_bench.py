"""Two-parallelism scaling probe — the sandbox stand-in for the north
rule's "N vs 4N executors" criterion: run the identical crawl job on the
identical input at local[8] and local[32] in separate processes, report
URLs/sec at both and the strong-scaling efficiency
    eff = (throughput_32 / throughput_8) / 4.

Writes scaling_report.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    t8, t32 = r8["value"], r32["value"]
    eff = (t32 / t8) / 4.0
    report = {
        "input": SF_DIR,
        "n_pages": r8["n_pages"],
        "urls_per_sec_local8": t8,
        "urls_per_sec_local32": t32,
        "speedup_8_to_32": round(t32 / t8, 3),
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "queries_local8": r8["queries"],
        "queries_local32": r32["queries"],
    }
    with open(os.path.join(REPO, "scaling_report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    print()
    print("| cores | URLs/sec | speedup vs 8 | efficiency (N->4N) |")
    print("|---|---|---|---|")
    print(f"| 8 (N) | {t8} | 1.0 | — |")
    print(f"| 32 (4N) | {t32} | {t32 / t8:.2f} | {eff:.2f} |")


if __name__ == "__main__":
    main()
