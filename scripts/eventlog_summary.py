"""Summarize a Spark event log (plain JSON lines, compression off —
scripts/standalone_worker.py writes them that way): job count, serial
gap between jobs, total/per-stage executor run time, GC, spills,
locality mix, utilization. Used to attribute scaling-efficiency loss
in BENCH/BASELINE.md.

Usage: python scripts/eventlog_summary.py <eventlog-file> [cores]
"""

import json
import sys
from collections import defaultdict


def summarize(fn: str, cores: int | None = None) -> dict:
    jobs = []
    tasks = 0
    run = gc = deser = fetch = memspill = diskspill = 0
    locality: dict = defaultdict(int)
    stage_rt: dict = defaultdict(int)
    stage_tasks: dict = defaultdict(int)
    stage_max: dict = defaultdict(int)
    first = last = None
    for ln in open(fn, errors="replace"):
        try:
            if '"SparkListenerJobStart"' in ln:
                ev = json.loads(ln)
                jobs.append([ev.get("Submission Time", 0), None])
            elif '"SparkListenerJobEnd"' in ln:
                ev = json.loads(ln)
                for j in reversed(jobs):
                    if j[1] is None:
                        j[1] = ev.get("Completion Time", 0)
                        break
            elif '"SparkListenerTaskEnd"' in ln:
                ev = json.loads(ln)
                tasks += 1
                tm = ev.get("Task Metrics") or {}
                ti = ev.get("Task Info", {})
                locality[ti.get("Locality", "?")] += 1
                lt, ft = ti.get("Launch Time", 0), ti.get("Finish Time", 0)
                first = lt if first is None else min(first, lt)
                last = max(last or 0, ft)
                rt = tm.get("Executor Run Time", 0)
                run += rt
                gc += tm.get("JVM GC Time", 0)
                deser += tm.get("Executor Deserialize Time", 0)
                fetch += (tm.get("Shuffle Read Metrics", {})
                          .get("Fetch Wait Time", 0))
                memspill += tm.get("Memory Bytes Spilled", 0)
                diskspill += tm.get("Disk Bytes Spilled", 0)
                sid = ev.get("Stage ID")
                stage_rt[sid] += rt
                stage_tasks[sid] += 1
                stage_max[sid] = max(stage_max[sid], rt)
        except ValueError:
            continue
    # serial gap: wall time inside the job span covered by no job
    iv = sorted((s, e) for s, e in jobs if e)
    covered = 0
    cur_s = cur_e = None
    for s, e in iv:
        if cur_s is None:
            cur_s, cur_e = s, e
            continue
        if s > cur_e:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_s is not None:
        covered += cur_e - cur_s
    span = (iv[-1][1] - iv[0][0]) if iv else 0
    out = {
        "jobs": len(jobs), "tasks": tasks,
        "job_span_s": round(span / 1000, 1),
        "in_job_s": round(covered / 1000, 1),
        "serial_gap_s": round((span - covered) / 1000, 1),
        "executor_run_s": round(run / 1000, 1),
        "gc_s": round(gc / 1000, 1),
        "deserialize_s": round(deser / 1000, 1),
        "fetch_wait_s": round(fetch / 1000, 1),
        "mem_spill_mb": round(memspill / 1e6),
        "disk_spill_mb": round(diskspill / 1e6),
        "locality": dict(locality),
        "top_stages": [
            {"stage": sid, "tasks": stage_tasks[sid],
             "run_s": round(rt / 1000, 1),
             "max_task_s": round(stage_max[sid] / 1000, 1)}
            for sid, rt in sorted(stage_rt.items(), key=lambda kv: -kv[1])[:6]
        ],
    }
    if cores:
        out["utilization"] = round(run / 1000 / (cores * span / 1000), 3)
    return out


if __name__ == "__main__":
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else None
    print(json.dumps(summarize(sys.argv[1], cores), indent=2))
