#!/bin/bash
# Page-cache-squeeze CONTROL for the ladder's second-octave drift
# (0.973 -> 1.159, BENCH/BASELINE.md "Data-size ladder"): re-run the
# 2.4M zstd leg — whose unpinned wall (2222.3 s) sits on the linear
# fit — while tools/memory_pin.py holds enough DRAM resident to push
# the host's free-memory floor from the 2.4M leg's 47.5 GB down to
# the 4.8M leg's measured 13.1 GB. If the squeeze is the drift's
# cause, the pinned 2.4M wall should inflate by roughly the
# second-octave excess (2^0.159 ~ +12%); if it reads flat, the
# squeeze hypothesis is refuted and the drift needs another cause.
#
# The pin self-reports in the leg's host census (hostload.py counts
# memory_pin as a compute proc) — this run is DELIBERATELY
# contaminated and tagged _zstd_pin so it can never be mistaken for
# a clean ladder leg.
#
# Usage: tools/run_pinned_control_r6.sh [GIB]   (default 35)
set -u
cd "$(dirname "$0")/.."
gib=${1:-35}

python tools/memory_pin.py "$gib" &
pin=$!
trap 'kill $pin 2>/dev/null' EXIT
# wait for the touch pass to finish (the pin prints when resident)
for _ in $(seq 120); do
  rss=$(awk '/VmRSS/ {print int($2 / 1048576)}' /proc/$pin/status 2>/dev/null)
  [ "${rss:-0}" -ge "$((gib - 1))" ] && break
  sleep 2
done
echo "pin pid=$pin rss_gib=${rss:-?} target=$gib"

tools/run_leg_with_disk_census.sh 2400000 128 "_zstd_pin${gib}g"
rc=$?
kill $pin 2>/dev/null
exit $rc
