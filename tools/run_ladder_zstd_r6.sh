#!/bin/bash
# Round-6 data-size ladder, zstd edition: the lz4-codec 4.8M leg needs
# > 81 GB of shuffle scratch and filled the sandbox disk TWICE
# (BENCH/disk_census_4800000_lz4_diskfull_r6.log — 100% of the bytes
# in executor /tmp/spark-* shuffle dirs), so the LADDER runs under a
# zstd shuffle codec (bench_scaling_cluster.py PKE_SCALE_IO_CODEC;
# the engine default stays lz4 — the measured trade at 1.2M was only
# -19% disk for +25% wall on 1-core executors, see session.py) and
# the WHOLE ladder re-runs under it: a fitted exponent needs every
# leg on one config. The committed lz4 legs (1.2M 904.8s / 2.4M
# 1808.1s, exponent 0.999) stay on the record as the codec A/B.
#
# Same protocol otherwise: local-cluster[4,1,8192], Heaps vocabulary,
# AUTO stop-list (shipped default), AQE off, constant 18,750
# rows/partition, scratch cleaned between legs, 20 s disk census.
set -u
cd "$(dirname "$0")/.."

run_leg() {
  rm -rf /tmp/blockmgr-* /tmp/spark-* /opt/spark/work/* 2>/dev/null
  tools/run_leg_with_disk_census.sh "$1" "$2" _zstd
}

run_leg 1200000 64
run_leg 2400000 128
run_leg 4800000 256
echo "=== zstd ladder done $(date -u +%H:%M:%S) ==="
