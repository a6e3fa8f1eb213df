"""Per-stage scaling probe (r15): run one registered query isolated
at a given core count with the Spark event log enabled, then parse the
log into per-stage wall/task metrics so the 8-core-vs-32-core
anti-scaling cluster (PERF_r14.json scaling ratios < 1) can be
attributed to a STAGE, not guessed at.

Usage: python tools/probe_scaling_r15.py <query> <cpus> [sf_dir] [runs]
Emits (stderr): per-run wall seconds; (stdout) one JSON line with the
timed-run stage table: stage id, name head, tasks, wall ms, sum task
ms, gc ms, spill bytes, peak exec memory, shuffle read/write bytes,
fetch-wait ms.  The timed run is isolated from the warm-up by job
description ("r15probe-timed").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ondemand_dask_spark.operators.checkpoint import (  # noqa: E402
    evict_all_retained,
)
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    cpus = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    logdir = tempfile.mkdtemp(prefix="r15evlog_")
    spark = build_session(
        app_name="probe_scaling_r15",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{logdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def run_once(tag: str) -> float:
        evict_all_retained()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        df = qs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    walls = []
    run_once("r15probe-warmup")
    for i in range(runs):
        walls.append(round(run_once(f"r15probe-timed-{i}"), 4))
    print(f"{name} cpus={cpus}: walls {walls}", file=sys.stderr)
    best_i = min(range(runs), key=lambda i: walls[i])

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: map stages of the best timed run's jobs.
    # Spark 4 may write a rolling dir (eventlog_v2_<appid>/events_*).
    evpath = os.path.join(logdir, app_id)
    if not os.path.exists(evpath):
        evdir = os.path.join(logdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(evdir, f)
            for f in os.listdir(evdir)
            if f.startswith("events_")
        )
    else:
        parts = [evpath]

    def iter_lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    stage_jobs: dict[int, str] = {}  # stage id -> job description
    stages: dict[int, dict] = {}
    tasks: dict[int, dict] = {}
    if True:
        for line in iter_lines():
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for sid in ev.get("Stage IDs", []):
                    stage_jobs[sid] = desc
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:70],
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_ms": (si.get("Completion Time") or 0)
                    - (si.get("Submission Time") or 0),
                }
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                t = tasks.setdefault(
                    sid,
                    {
                        "task_ms": 0,
                        "gc_ms": 0,
                        "spill_mem": 0,
                        "spill_disk": 0,
                        "peak_exec_mem": 0,
                        "sh_read": 0,
                        "sh_write": 0,
                        "fetch_wait_ms": 0,
                        "deser_ms": 0,
                    },
                )
                t["task_ms"] += tm.get("Executor Run Time", 0)
                t["gc_ms"] += tm.get("JVM GC Time", 0)
                t["spill_mem"] += tm.get("Memory Bytes Spilled", 0)
                t["spill_disk"] += tm.get("Disk Bytes Spilled", 0)
                t["peak_exec_mem"] = max(
                    t["peak_exec_mem"], tm.get("Peak Execution Memory", 0)
                )
                t["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                t["sh_read"] += sr.get("Local Bytes Read", 0) + sr.get(
                    "Remote Bytes Read", 0
                )
                t["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                t["sh_write"] += sw.get("Shuffle Bytes Written", 0)

    tag = f"r15probe-timed-{best_i}"
    rows = []
    for sid, s in sorted(stages.items()):
        if stage_jobs.get(sid) != tag:
            continue
        s.update(tasks.get(sid, {}))
        rows.append(s)
    shutil.rmtree(logdir, ignore_errors=True)
    print(
        json.dumps(
            {
                "query": name,
                "cpus": int(cpus),
                "walls": walls,
                "best": min(walls),
                "stages": rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
