#!/bin/bash
# Re-run one data-size ladder leg with a DISK census: the first 4.8M
# attempt died on `No space left on device` mid-shuffle (stage 14,
# BENCH/scaling_4800000_heaps_4exec_auto_r6_diskfull.err.log.gz), so —
# same policy as the host-load census for CPU contamination — the
# rerun samples, every 20 s, the filesystem headroom plus the three
# Spark scratch consumers (driver/executor blockmgr + spark scratch in
# /tmp, worker dirs under /opt/spark/work). Pass or fail, the peak
# attributes WHERE the bytes went.
#
# Usage: tools/run_leg_with_disk_census.sh ROWS PARTS [TAGSUFFIX]
set -u
cd "$(dirname "$0")/.."
rows=$1 parts=$2 suffix=${3:-}
tag="scaling_${rows}_heaps_4exec_auto${suffix}_r6"
census="BENCH/disk_census_${rows}${suffix}_r6.log"

sampler() {
  while true; do
    avail=$(df -B1M --output=avail / | tail -1 | tr -d ' ')
    blk=$(du -sm /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
    stmp=$(du -sm /tmp/spark-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
    work=$(du -sm /opt/spark/work 2>/dev/null | awk '{print $1+0}')
    echo "$(date -u +%s) avail_mb=$avail blockmgr_mb=$blk sparktmp_mb=$stmp work_mb=$work"
    sleep 20
  done
}

: > "$census"
sampler >> "$census" 2>/dev/null &
spid=$!
trap 'kill $spid 2>/dev/null' EXIT

echo "=== leg rows=$rows parts=$parts $(date -u +%H:%M:%S) ==="
PKE_SCALE_ROWS=$rows PKE_SCALE_VOCAB=heaps \
PKE_SCALE_SHUFFLE_PARTS=$parts PKE_SCALE_SIG_MAX_DF=auto \
python bench_scaling_cluster.py --run 4 \
  > "BENCH/${tag}.json.log" 2> "BENCH/${tag}.err.log"
rc=$?
echo "exit=$rc $(tail -c 400 BENCH/${tag}.json.log)"
echo "peak-usage sample (lowest avail):"
sort -t= -k2 -n "$census" | head -3
exit $rc
