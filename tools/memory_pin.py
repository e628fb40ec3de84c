#!/usr/bin/env python
"""Pin N GiB of anonymous memory resident, then sleep.

The DRAM-side control for the ladder's second-octave drift
(BENCH/BASELINE.md "Data-size ladder"): the 4.8M zstd leg's 67.8 GB
of live shuffle squeezed the host's free memory to 13.1 GB, evicting
page cache under the shuffle files, while the 2.4M leg never dropped
below 47.5 GB. Running the 2.4M leg WITH this pin holding the free
floor at the 4.8M level reproduces (or refutes) the squeeze causally
on an input whose unpinned wall is a known-linear point.

With no swap configured (this sandbox), touched anonymous pages are
unreclaimable, so after the initial touch pass the pin costs ~zero
CPU — it steals DRAM, not cycles (cf. tools/bandwidth_control.py,
which steals memory BANDWIDTH; this steals CAPACITY).

Usage: python tools/memory_pin.py GIB   (Ctrl-C / SIGTERM to release)
"""

from __future__ import annotations

import sys
import time

PAGE = 4096
CHUNK = 256 << 20  # 256 MiB per allocation


def main() -> None:
    gib = float(sys.argv[1])
    total = int(gib * (1 << 30))
    chunks = []
    allocated = 0
    while allocated < total:
        n = min(CHUNK, total - allocated)
        buf = bytearray(n)
        # touch one byte per page so every page is faulted in and
        # counted against RSS (bytearray zero-fill may be lazy)
        for off in range(0, n, PAGE):
            buf[off] = 1
        chunks.append(buf)
        allocated += n
    print(f"pinned {allocated / (1 << 30):.1f} GiB resident", flush=True)
    while True:
        time.sleep(60)


if __name__ == "__main__":
    main()
