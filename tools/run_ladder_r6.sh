#!/bin/bash
# Round-6 data-size ladder, remaining legs (leg 1 = 1.2M @ p64 already
# recorded: BENCH/scaling_1200000_heaps_4exec_auto_r6.json.log).
#
# Partition policy: partitions scale with the data at a constant
# 18,750 rows/partition (1.2M->64, 2.4M->128, 4.8M->256) — the
# deployment-realistic sizing that keeps PER-TASK memory constant
# across the ladder, which is what lets every leg run on the same
# 1 GB executor heaps (scale out, not up). The r5 p64-vs-p128
# discriminator at 2.4M measured <=3.7% wall sensitivity to this
# choice, so the fitted exponent is insensitive to it.
#
# The first r6 attempt at 2.4M ran p64 and OOM'd the 1 GB executors in
# the salted concept aggregation (failure kept on record:
# BENCH/scaling_2400000_heaps_4exec_auto_r6_oom1g.err.log); the fix is
# structural (reduce-side object agg, operators/concepts.py) plus this
# partition policy.
set -u
cd "$(dirname "$0")/.."

run_leg() {
  local rows=$1 parts=$2
  # scratch from the PREVIOUS leg (blockmgr/work dirs a crashed or
  # just-stopped session leaves behind) competes with this leg's
  # shuffle for the shared sandbox disk — the first back-to-back run
  # of this script filled the disk mid-4.8M (stage 14, failure log
  # kept). Clean between legs and sample a 20 s disk census so peak
  # scratch is a recorded number (tools/run_leg_with_disk_census.sh).
  rm -rf /tmp/blockmgr-* /tmp/spark-* /opt/spark/work/* 2>/dev/null
  tools/run_leg_with_disk_census.sh "$rows" "$parts"
}

run_leg 2400000 128
run_leg 4800000 256
echo "=== ladder done $(date -u +%H:%M:%S) ==="
