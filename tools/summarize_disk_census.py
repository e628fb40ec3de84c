#!/usr/bin/env python
"""Summarize a ladder leg's disk census (tools/run_leg_with_disk_census.sh).

Reports peak scratch consumption and the trough of filesystem
headroom, attributing bytes to the three Spark scratch consumers the
sampler tracks (driver/executor blockmgr dirs, spark-* scratch in
/tmp, worker dirs under /opt/spark/work). The point: make "how much
disk does a leg need" a recorded number — the first 4.8M attempt died
on a full disk and the artifact could not say where the bytes went.

    python tools/summarize_disk_census.py BENCH/disk_census_4800000_r6.log
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    rows = []
    for line in open(path):
        parts = line.split()
        if not parts:
            continue
        r = {"ts": int(parts[0])}
        for kv in parts[1:]:
            k, _, v = kv.partition("=")
            r[k] = int(v)
        rows.append(r)
    if not rows:
        raise SystemExit("empty census")
    t0 = rows[0]["ts"]
    scratch = [
        r["blockmgr_mb"] + r["sparktmp_mb"] + r["work_mb"] for r in rows
    ]
    peak_i = max(range(len(rows)), key=lambda i: scratch[i])
    trough_i = min(range(len(rows)), key=lambda i: rows[i]["avail_mb"])
    out = {
        "samples": len(rows),
        "duration_s": rows[-1]["ts"] - t0,
        "start_avail_mb": rows[0]["avail_mb"],
        "min_avail_mb": rows[trough_i]["avail_mb"],
        "min_avail_at_s": rows[trough_i]["ts"] - t0,
        "peak_scratch_mb": scratch[peak_i],
        "peak_scratch_at_s": rows[peak_i]["ts"] - t0,
        "peak_breakdown_mb": {
            "blockmgr": rows[peak_i]["blockmgr_mb"],
            "spark_tmp": rows[peak_i]["sparktmp_mb"],
            "spark_work": rows[peak_i]["work_mb"],
        },
        "end_scratch_mb": scratch[-1],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1])
