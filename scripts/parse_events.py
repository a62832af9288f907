"""Parse a Spark event log dir: per-stage wall, task-time sum, GC, shuffle IO.

Usage: python scripts/parse_events.py /tmp/spark-events-32
"""

import glob
import json
import os
import sys
from collections import defaultdict

evdir = sys.argv[1]
stage_wall = {}
stage_name = {}
stage_tasks = defaultdict(int)
agg = defaultdict(lambda: defaultdict(float))
plans = []

for f in sorted(glob.glob(f"{evdir}/**/*", recursive=True)):
    if not os.path.isfile(f) or f.endswith((".crc", ".zstd")) and f.endswith(".crc"):
        continue
    try:
        fh = open(f, errors="ignore")
    except IsADirectoryError:
        continue
    for line in fh:
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if not isinstance(ev, dict):
            continue
        e = ev.get("Event", "")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stage_wall[sid] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
            stage_name[sid] = si["Stage Name"].split("\n")[0][:60]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            stage_tasks[sid] += 1
            tm = ev.get("Task Metrics") or {}
            a = agg[sid]
            a["run_s"] += tm.get("Executor Run Time", 0) / 1000
            a["gc_s"] += tm.get("JVM GC Time", 0) / 1000
            a["deser_s"] += tm.get("Executor Deserialize Time", 0) / 1000
            a["result_ser_s"] += tm.get("Result Serialization Time", 0) / 1000
            srm = tm.get("Shuffle Read Metrics") or {}
            a["sh_read_mb"] += (srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)) / 1e6
            a["sh_fetch_wait_s"] += srm.get("Fetch Wait Time", 0) / 1000
            swm = tm.get("Shuffle Write Metrics") or {}
            a["sh_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
            a["sh_write_s"] += swm.get("Shuffle Write Time", 0) / 1e9
            im = tm.get("Input Metrics") or {}
            a["input_mb"] += im.get("Bytes Read", 0) / 1e6
            a["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
        elif e.endswith("SparkListenerSQLExecutionStart"):
            plans.append(ev.get("physicalPlanDescription", "")[:4000])

for sid in sorted(stage_wall):
    a = agg[sid]
    print(f"stage {sid:3d} wall={stage_wall[sid]:7.2f}s tasks={stage_tasks[sid]:4d} "
          f"run={a['run_s']:8.1f}s cpu={a['cpu_s']:8.1f}s gc={a['gc_s']:6.1f}s "
          f"shR={a['sh_read_mb']:8.1f}MB shW={a['sh_write_mb']:8.1f}MB "
          f"fetchwait={a['sh_fetch_wait_s']:5.1f}s | {stage_name[sid]}")

if "--plans" in sys.argv:
    for p in plans:
        print("=" * 80)
        print(p)
