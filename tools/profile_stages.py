"""Stage-level profile of registry queries via the Spark event log.

For each named query: one warm-up pass, then one profiled pass wrapped
in setJobDescription(name). Afterwards the event log is parsed into a
per-query stage table — wallclock, task count, summed executor run
time, max task time — the guide §1/§7 "where does the time go" view
without the UI.

Usage: python tools/profile_stages.py [sf_dir] <query ...>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cust_sagemaker_feature_store_spark import get_spark
from cust_sagemaker_feature_store_spark.queries import REGISTRY


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0].startswith("/"):
        sf_dir, args = args[0], args[1:]
    names = [n for n in args if n in REGISTRY]
    for n in args:
        if n not in REGISTRY:
            print(f"SKIP {n}: not in REGISTRY")
    if not names:
        print("no valid query names given")
        return 2
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    try:
        return _run(evdir, sf_dir, names)
    finally:
        shutil.rmtree(evdir, ignore_errors=True)


def _run(evdir: str, sf_dir: str, names: list[str]) -> int:
    spark = get_spark(
        "profile_stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    walls = {}
    for name in names:
        spec = REGISTRY[name]
        spec.fn(spark, sf_dir).count()  # warm
        sc.setJobDescription(f"PROFILE::{name}")
        t0 = time.time()
        spec.fn(spark, sf_dir).count()
        walls[name] = time.time() - t0
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # parse the event log (Spark 4 writes a rolling eventlog_v2_<app> dir)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            p for p in os.listdir(v2) if p.startswith("events_")
        )
        path = os.path.join(v2, parts[0])
        if len(parts) > 1:
            merged = os.path.join(evdir, "merged_events")
            with open(merged, "w") as out:
                for p in parts:
                    with open(os.path.join(v2, p)) as fh:
                        out.write(fh.read())
            path = merged
    job_desc = {}       # jobId -> description
    job_stages = {}     # jobId -> [stageIds]
    stage_info = {}     # stageId -> dict
    stage_tasks = defaultdict(lambda: [0, 0.0, 0.0, 0])  # n, sum_run_s, max_run_s, gc_ms
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                job_desc[ev["Job ID"]] = props.get("spark.job.description", "")
                job_stages[ev["Job ID"]] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:60],
                    "ntask": si.get("Number of Tasks", 0),
                    "wall": ((comp - sub) / 1000.0) if sub and comp else 0.0,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                run = tm.get("Executor Run Time", 0) / 1000.0
                rec = stage_tasks[sid]
                rec[0] += 1
                rec[1] += run
                rec[2] = max(rec[2], run)
                rec[3] += tm.get("JVM GC Time", 0)

    for name in names:
        print(f"\n=== {name}  wall={walls[name]:.3f}s ===")
        jids = [j for j, d in job_desc.items() if d == f"PROFILE::{name}"]
        rows = []
        for j in sorted(jids):
            for sid in job_stages.get(j, []):
                si = stage_info.get(sid)
                if si is None:
                    continue  # skipped stage (reused exchange)
                n, s, mx, gc = stage_tasks.get(sid, [0, 0, 0, 0])
                rows.append((si["wall"], sid, si["ntask"], s, mx, si["name"]))
        rows.sort(reverse=True)
        tot = sum(r[0] for r in rows)
        print(f"  {len(rows)} stages, stage-wall sum {tot:.2f}s")
        for wall, sid, ntask, s, mx, nm in rows[:14]:
            print(
                f"  wall {wall:6.2f}s  tasks {ntask:4d}  cpu {s:6.2f}s  "
                f"maxtask {mx:5.2f}s  [{sid}] {nm}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
