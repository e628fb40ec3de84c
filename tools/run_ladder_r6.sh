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
  local tag="scaling_${rows}_heaps_4exec_auto_r6"
  echo "=== leg rows=$rows parts=$parts $(date -u +%H:%M:%S) ==="
  PKE_SCALE_ROWS=$rows PKE_SCALE_VOCAB=heaps \
  PKE_SCALE_SHUFFLE_PARTS=$parts PKE_SCALE_SIG_MAX_DF=auto \
  python bench_scaling_cluster.py --run 4 \
    > "BENCH/${tag}.json.log" 2> "BENCH/${tag}.err.log"
  echo "exit=$? $(tail -c 400 BENCH/${tag}.json.log)"
}

run_leg 2400000 128
run_leg 4800000 256
echo "=== ladder done $(date -u +%H:%M:%S) ==="
