#!/usr/bin/env python
"""Per-job wall-clock breakdown of one or more headline queries (guide §1:
find where the time goes before touching anything).

Runs each named query once (warm-up) then once timed with the noop sink,
recording every Spark job fired during the timed evaluation via a
`StatusTracker` sweep: job ids, per-job duration, and the job group/
description. Local[$SPARK_GRAFT_CPUS], same confs as bench.py.

Usage: PYTHONPATH=/root/repo python tools/job_breakdown_r12.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import makinage_spark as mk  # noqa: E402
from makinage_spark.queries import QUERIES  # noqa: E402


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = "/tmp/spark-events-r12"
    os.makedirs(evdir, exist_ok=True)
    spark = mk.get_spark(
        app_name="job_breakdown_r12",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    marks = {}
    for name in names:
        # warm-up (uncounted)
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: warm-up FAILED {type(e).__name__}: {e}")
            continue
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"r12probe:{name}")
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        marks[name] = dt
        spark.catalog.clearCache()
    spark.stop()
    # parse the event log: job starts/ends with our descriptions
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(evdir) if app_id in p]
        path = os.path.join(evdir, cands[0])
    if os.path.isdir(path):
        # Spark 4 rolling event log: a directory of events_N_<appId> files
        lines = []
        for p in sorted(os.listdir(path)):
            if p.startswith("events"):
                lines.extend(open(os.path.join(path, p)).read().splitlines())
    else:
        lines = open(path).read().splitlines()
    jobs = {}
    stage_of_job = {}
    stages = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except Exception:  # noqa: BLE001
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
                for s in ev.get("Stage Infos", []):
                    stage_of_job[s["Stage ID"]] = ev["Job ID"]
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                }
    for name in names:
        if name not in marks:
            continue
        tag = f"r12probe:{name}"
        mine = sorted(
            (j for j in jobs.items() if j[1]["desc"] == tag), key=lambda kv: kv[0]
        )
        print(f"\n=== {name}: timed total {marks[name]:.3f}s, {len(mine)} jobs ===")
        for jid, j in mine:
            dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
            st = [
                f"s{sid}[{stages[sid]['tasks']}t {stages[sid]['ms']}ms {stages[sid]['name']}]"
                for sid in j["stages"]
                if sid in stages
            ]
            print(f"  job {jid}: {dur:7.3f}s  {'; '.join(st)[:240]}")


if __name__ == "__main__":
    main()
