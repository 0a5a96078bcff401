#!/usr/bin/env python
"""Parse a Spark event log into a per-job timeline: job wall, task
count, max-task share, and the DRIVER GAP before each job (time the
cluster sat idle between the previous job's end and this job's start —
Catalyst planning, Py4J round-trips, parquet commit protocol, manifest
IO). The gap column is what bounds superstep loop scaling: it is
constant per superstep regardless of core count.

Usage: python scripts/parse_eventlog.py /tmp/spark-events/<app-id>
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str) -> None:
    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, list] = defaultdict(list)
    stage_to_job: dict[int, int] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "end": None,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60]
                    or (ev["Stage Infos"][-1]["Stage Name"][:60] if ev.get("Stage Infos") else ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
                for s in ev.get("Stage Infos", []):
                    stage_to_job[s["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                tm = ev.get("Task Metrics") or {}
                stage_tasks[sid].append(
                    (
                        dur,
                        tm.get("Executor Run Time", 0),
                        tm.get("Executor CPU Time", 0) / 1e6,  # ns → ms
                        tm.get("JVM GC Time", 0),
                        tm.get("Executor Deserialize Time", 0),
                    )
                )

    order = sorted(jobs, key=lambda j: jobs[j]["start"])
    if not order:
        print("no jobs found")
        return
    t0 = jobs[order[0]]["start"]
    prev_end = t0
    tot_job = tot_gap = 0.0
    tot_run = tot_cpu = tot_gc = tot_deser = 0.0
    print(
        f"{'job':>4} {'gap_s':>7} {'wall_s':>7} {'tasks':>6} {'maxtask_s':>9} "
        f"{'cpu%':>5} {'gc%':>4}  desc"
    )
    for j in order:
        job = jobs[j]
        end = job["end"] or job["start"]
        gap = (job["start"] - prev_end) / 1e3
        wall = (end - job["start"]) / 1e3
        tasks = [d for s in job["stages"] for d in stage_tasks.get(s, [])]
        mx = max((d[0] for d in tasks), default=0) / 1e3
        run = sum(d[1] for d in tasks)
        cpu = sum(d[2] for d in tasks)
        gc = sum(d[3] for d in tasks)
        deser = sum(d[4] for d in tasks)
        # cpu% = executor CPU / executor run time: the gap is GC +
        # shuffle/python/IO wait — the scaling tax local-mode task
        # threads pay that wall-clock alone cannot attribute
        cpup = 100 * cpu / run if run else 0.0
        gcp = 100 * gc / run if run else 0.0
        print(
            f"{j:>4} {gap:>7.2f} {wall:>7.2f} {len(tasks):>6} {mx:>9.2f} "
            f"{cpup:>5.0f} {gcp:>4.0f}  {job['desc']}"
        )
        tot_job += wall
        tot_gap += max(0.0, gap)
        tot_run += run
        tot_cpu += cpu
        tot_gc += gc
        tot_deser += deser
        prev_end = max(prev_end, end)
    span = (prev_end - t0) / 1e3
    print(
        f"\nspan {span:.1f}s = jobs {tot_job:.1f}s + driver gaps {tot_gap:.1f}s "
        f"({100 * tot_gap / max(span, 1e-9):.0f}% idle)"
    )
    if tot_run:
        print(
            f"task-time {tot_run / 1e3:.1f}s: cpu {100 * tot_cpu / tot_run:.0f}% "
            f"gc {100 * tot_gc / tot_run:.0f}% "
            f"deserialize {100 * tot_deser / tot_run:.0f}% "
            f"other-wait {100 * (tot_run - tot_cpu - tot_gc - tot_deser) / tot_run:.0f}%"
        )


if __name__ == "__main__":
    main(sys.argv[1])
