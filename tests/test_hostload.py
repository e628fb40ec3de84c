"""Host-load census (hostload.py): the bench-artifact cleanliness
stamp. Covers the round-6 refinement — every foreign entry carries an
instantaneous CPU-share prefix so keyword false-positives (idle
shells naming bench artifacts) self-adjudicate at 0% instead of
requiring a cross-referenced rerun."""

import os
import subprocess
import time

from pdf_knowledge_extractor_spark.hostload import (
    foreign_compute_procs,
    load_snapshot,
)


def test_own_tree_excluded():
    """Children of the census process (our Spark JVM, python workers)
    are never reported, however compute-like their command lines."""
    p = subprocess.Popen(
        ["bash", "-c", "sleep 5 # org.apache.spark fake child"]
    )
    try:
        time.sleep(0.3)
        assert not any(
            "fake child" in e for e in foreign_compute_procs(sample_s=0.1)
        )
    finally:
        p.terminate()
        p.wait()


def test_foreign_proc_cpu_annotation():
    """A DETACHED busy process whose cmdline matches the compute
    keywords is reported with a [cpu N%] prefix, and its measured
    share is high; after it exits the census is empty again."""
    marker = f"bench_census_pytest_{os.getpid()}"
    burn = subprocess.Popen(
        ["setsid", "bash", "-c",
         f"end=$((SECONDS+20)); while [ $SECONDS -lt $end ]; do :; "
         f"done # {marker}"],
        start_new_session=True,
    )
    try:
        time.sleep(0.5)
        hits = [e for e in foreign_compute_procs(sample_s=0.25)
                if marker in e]
        assert hits, "detached busy proc not seen by the census"
        entry = hits[0]
        assert entry.startswith("[cpu "), entry
        pct = float(entry.split("%")[0].split("[cpu ")[1])
        assert pct > 50.0, entry  # a spin loop reads ~100%
    finally:
        subprocess.run(["pkill", "-f", marker], check=False)
        burn.wait()
    time.sleep(0.2)
    assert not any(marker in e for e in foreign_compute_procs(sample_s=0.1))


def test_snapshot_shape():
    snap = load_snapshot()
    assert set(snap) == {"load1", "load5", "foreign_compute_procs"}
    assert isinstance(snap["foreign_compute_procs"], list)
