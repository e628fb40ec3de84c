#!/usr/bin/env python
"""Parse Spark event logs from bench_scaling_cluster.py runs and name
the non-scaling component of an N -> 4N octave.

Usage:
    python tools/profile_scaling.py BENCH/eventlogs_1200k/<app-lo>          # one run
    python tools/profile_scaling.py <app-lo> <app-hi>                       # compare

Per run it reports, per JOB (keyed by spark.job.description set in
run_pipeline) and per STAGE: wall, #tasks, task-time sum, max task,
GC, spill, shuffle bytes.  Driver gap = app wall minus the union of
job intervals (Catalyst analysis, broadcast builds, Python driver
code).  In compare mode, jobs are aligned by their deterministic
sequence; a job whose wall ratio lo/hi is far below the executor
ratio is the non-scaling component.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _event_files(path: str) -> list[str]:
    """Resolve a path (plain log file, eventlog_v2_* rolling dir, or a
    parent dir of app logs) to an ordered list of event files."""
    if os.path.isfile(path):
        return [path]
    entries = sorted(os.listdir(path))
    parts = [e for e in entries if e.startswith("events_")]
    if parts:  # rolling v2 app dir: events_<idx>_<appid>[...]
        parts.sort(key=lambda e: int(e.split("_")[1]))
        return [os.path.join(path, e) for e in parts]
    # parent dir: pick the newest app entry (file or v2 dir)
    cand = sorted(
        (os.path.join(path, e) for e in entries
         if not e.startswith(".")),
        key=os.path.getmtime,
    )
    if not cand:
        raise SystemExit(f"no event logs in {path}")
    return _event_files(cand[-1])


def load_events(path: str):
    for f in _event_files(path):
        with open(f, errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        yield json.loads(line)
                    except json.JSONDecodeError:
                        continue


def parse(path: str) -> dict:
    jobs = {}          # job id -> dict
    stages = {}        # stage id -> dict
    stage_job = {}     # stage id -> job id
    app_start = app_end = None
    for ev in load_events(path):
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "id": jid,
                "desc": (props.get("spark.job.description")
                         or props.get("callSite.short") or "")[:80],
                "start": ev["Submission Time"],
                "end": None,
                "stages": ev.get("Stage IDs", []),
            }
            for sid in ev.get("Stage IDs", []):
                stage_job[sid] = jid
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            st = stages.setdefault(sid, defaultdict(float))
            st["id"] = sid
            st["name"] = si.get("Stage Name", "")[:60]
            st["n_tasks"] = si.get("Number of Tasks", 0)
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub and comp:
                st["wall_s"] = (comp - sub) / 1000.0
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            st = stages.setdefault(sid, defaultdict(float))
            ti = ev.get("Task Info") or {}
            tm = ev.get("Task Metrics") or {}
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
            st["task_sum_s"] += dur
            st["task_max_s"] = max(st.get("task_max_s", 0.0), dur)
            st["run_s"] += tm.get("Executor Run Time", 0) / 1000.0
            st["gc_s"] += tm.get("JVM GC Time", 0) / 1000.0
            st["deser_s"] += tm.get("Executor Deserialize Time", 0) / 1000.0
            st["spill_mem_mb"] += tm.get("Memory Bytes Spilled", 0) / 1e6
            st["spill_disk_mb"] += tm.get("Disk Bytes Spilled", 0) / 1e6
            srm = tm.get("Shuffle Read Metrics") or {}
            st["shuf_read_mb"] += (srm.get("Remote Bytes Read", 0)
                                   + srm.get("Local Bytes Read", 0)) / 1e6
            st["fetch_wait_s"] += srm.get("Fetch Wait Time", 0) / 1000.0
            swm = tm.get("Shuffle Write Metrics") or {}
            st["shuf_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
            st["shuf_write_s"] += swm.get("Shuffle Write Time", 0) / 1e9

    # attach stage rollups to jobs
    for j in jobs.values():
        j["wall_s"] = ((j["end"] or 0) - j["start"]) / 1000.0 if j["end"] else 0.0
        j["task_sum_s"] = sum(
            stages[s].get("task_sum_s", 0.0) for s in j["stages"] if s in stages
        )
        j["spill_disk_mb"] = sum(
            stages[s].get("spill_disk_mb", 0.0) for s in j["stages"] if s in stages
        )
        j["shuf_mb"] = sum(
            stages[s].get("shuf_read_mb", 0.0) + stages[s].get("shuf_write_mb", 0.0)
            for s in j["stages"] if s in stages
        )
    # driver gap: app wall minus union of job intervals
    ivals = sorted(
        (j["start"], j["end"]) for j in jobs.values() if j["end"]
    )
    covered, cur_s, cur_e = 0, None, None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    wall = ((app_end or (ivals[-1][1] if ivals else 0))
            - (app_start or (ivals[0][0] if ivals else 0))) / 1000.0
    return {
        "path": path if not os.path.isdir(path) else path,
        "wall_s": wall,
        "jobs_wall_s": covered / 1000.0,
        "driver_gap_s": wall - covered / 1000.0,
        "jobs": [jobs[k] for k in sorted(jobs)],
        "stages": stages,
    }


def report(r: dict, top: int = 20) -> None:
    print(f"== {r['path']}")
    print(f"app wall {r['wall_s']:.1f}s   jobs {r['jobs_wall_s']:.1f}s   "
          f"driver gap {r['driver_gap_s']:.1f}s   n_jobs {len(r['jobs'])}")
    print(f"{'job':>4} {'wall':>8} {'tasksum':>9} {'spillMB':>9} "
          f"{'shufMB':>8}  desc")
    for j in sorted(r["jobs"], key=lambda x: -x["wall_s"])[:top]:
        print(f"{j['id']:>4} {j['wall_s']:>8.1f} {j['task_sum_s']:>9.1f} "
              f"{j['spill_disk_mb']:>9.0f} {j['shuf_mb']:>8.0f}  {j['desc']}")
    print("-- top stages")
    print(f"{'stage':>6} {'wall':>8} {'ntask':>6} {'tsum':>8} {'tmax':>8} "
          f"{'gc':>6} {'spillMB':>8} {'shufR':>7} {'shufW':>7} {'fwait':>6}  name")
    sts = sorted(r["stages"].values(), key=lambda s: -s.get("wall_s", 0))[:top]
    for s in sts:
        print(f"{s['id']:>6} {s.get('wall_s',0):>8.1f} {s.get('n_tasks',0):>6.0f} "
              f"{s.get('task_sum_s',0):>8.1f} {s.get('task_max_s',0):>8.1f} "
              f"{s.get('gc_s',0):>6.1f} {s.get('spill_disk_mb',0):>8.0f} "
              f"{s.get('shuf_read_mb',0):>7.0f} {s.get('shuf_write_mb',0):>7.0f} "
              f"{s.get('fetch_wait_s',0):>6.1f}  {s.get('name','')}")


def compare(lo: dict, hi: dict) -> None:
    print(f"\n== compare lo({lo['wall_s']:.0f}s) vs hi({hi['wall_s']:.0f}s)"
          f"   walls ratio {lo['wall_s']/max(hi['wall_s'],1e-9):.2f}"
          f"   driver gaps {lo['driver_gap_s']:.0f}s vs {hi['driver_gap_s']:.0f}s")
    n = min(len(lo["jobs"]), len(hi["jobs"]))
    if len(lo["jobs"]) != len(hi["jobs"]):
        print(f"NOTE: job counts differ ({len(lo['jobs'])} vs {len(hi['jobs'])}) "
              f"- alignment by sequence may drift")
    print(f"{'job':>4} {'lo_wall':>8} {'hi_wall':>8} {'ratio':>6} "
          f"{'lo_spill':>9} {'hi_spill':>9}  desc")
    rows = []
    for a, b in zip(lo["jobs"][:n], hi["jobs"][:n]):
        ratio = a["wall_s"] / b["wall_s"] if b["wall_s"] > 0.05 else float("nan")
        rows.append((a, b, ratio))
    # sort by absolute non-scaling cost at hi: hi_wall - lo_wall/4
    for a, b, ratio in sorted(
        rows, key=lambda t: -(t[1]["wall_s"] - t[0]["wall_s"] / 4.0)
    )[:25]:
        print(f"{a['id']:>4} {a['wall_s']:>8.1f} {b['wall_s']:>8.1f} "
              f"{ratio:>6.2f} {a['spill_disk_mb']:>9.0f} "
              f"{b['spill_disk_mb']:>9.0f}  {a['desc'] or b['desc']}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not args:
        raise SystemExit(__doc__)
    runs = [parse(p) for p in args]
    for r in runs:
        report(r)
    if len(runs) == 2:
        compare(*runs)


if __name__ == "__main__":
    main()
