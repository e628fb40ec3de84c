#!/usr/bin/env python
"""Attribute the kg_pipeline_clustered bench-row variance
(VERDICT r5 item 3: 50.1-61.8s across 3 idle runs, ±12% — the widest
spread on the board).

Protocol: one session (bench-identical confs), run the clustered
pipeline $PKE_ATTRIB_RUNS times (default 4) exactly as bench.py's
kg_pipeline_clustered row does, and decompose EVERY run into per-job
wall time from Spark's status store, grouped by job description (the
pipeline and clustering operators set "pke: ..." markers; unmarked
jobs group by their callsite name). The noisy stage is the one whose
cross-run spread tracks the total's.

Output: one JSON object — per-run totals, per-stage medians and
spreads (max-min)/median, host census per run.

    python tools/attrib_clustered_variance.py > BENCH/attrib_clustered_r6.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = float(os.environ.get("PKE_ATTRIB_SF", "0.1"))
CORPUS_ROWS = int(os.environ.get("PKE_ATTRIB_ROWS", str(int(500_000 * SF))))
RUNS = int(os.environ.get("PKE_ATTRIB_RUNS", "4"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _jobs(sc) -> list[dict]:
    """All completed jobs from the status store: (id, group-label,
    duration sec)."""
    store = sc._jsc.sc().statusStore()
    out = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        comp = j.completionTime()
        if not (sub.isDefined() and comp.isDefined()):
            continue
        desc = j.description()
        label = desc.get() if desc.isDefined() else j.name().split(" at ")[0]
        out.append({
            "job_id": j.jobId(),
            "label": label,
            "t0": sub.get().getTime() / 1000.0,
            "dur": (comp.get().getTime() - sub.get().getTime()) / 1000.0,
        })
    return out


def _gc_ms(sc) -> int:
    """Total JVM GC time (ms) summed over live executors — per-run
    deltas separate 'the JVM was collecting' from host drift."""
    total = 0
    it = sc._jsc.sc().statusStore().executorList(True).iterator()
    while it.hasNext():
        total += it.next().totalGCTime()
    return int(total)


def main() -> None:
    from pdf_knowledge_extractor_spark.corpus import generate_corpus
    from pdf_knowledge_extractor_spark.hostload import load_snapshot
    from pdf_knowledge_extractor_spark.operators.ann import (
        release_checkpointed_results,
    )
    from pdf_knowledge_extractor_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from pdf_knowledge_extractor_spark.session import get_spark

    spark = get_spark("attrib-clustered", cpus=CPUS)
    sc = spark.sparkContext
    corpus = generate_corpus(spark, CORPUS_ROWS)
    corpus.count()  # warmup + materialize source

    runs = []
    for i in range(RUNS):
        spark.catalog.clearCache()
        release_checkpointed_results()
        seen = {j["job_id"] for j in _jobs(sc)}
        gc0 = _gc_ms(sc)
        t0 = time.perf_counter()
        cfg = PipelineConfig(
            similarity_strategy="minhash", with_clusters=True,
            cluster_k=8, coherence_mode="centroid",
        )
        res = run_pipeline(
            spark, corpus, cfg, id_col="doc_id", text_col="content",
            lang_col="lang",
        )
        res["triples"].count()
        res["clusters"].count()
        total = round(time.perf_counter() - t0, 3)
        jobs = [j for j in _jobs(sc) if j["job_id"] not in seen]
        stages: dict[str, float] = {}
        for j in jobs:
            stages[j["label"]] = round(
                stages.get(j["label"], 0.0) + j["dur"], 3
            )
        gaps = round(total - sum(j["dur"] for j in jobs), 3)
        runs.append({
            "total": total,
            "gc_delta_ms": _gc_ms(sc) - gc0,
            "stages": dict(
                sorted(stages.items(), key=lambda kv: -kv[1])
            ),
            "driver_gaps": gaps,  # wall not inside any job: planning,
                                  # Catalyst, py4j, GC pauses between jobs
            "host": load_snapshot(),
        })
        print(json.dumps(runs[-1]), file=sys.stderr, flush=True)

    labels = sorted({k for r in runs for k in r["stages"]})
    summary = {}
    for lab in labels:
        vals = [r["stages"].get(lab, 0.0) for r in runs]
        med = statistics.median(vals)
        summary[lab] = {
            "median": round(med, 3),
            "spread": round(max(vals) - min(vals), 3),
            "spread_frac_of_total_spread": None,
        }
    totals = [r["total"] for r in runs]
    gaps = [r["driver_gaps"] for r in runs]
    total_spread = max(totals) - min(totals)
    for lab in labels:
        vals = [r["stages"].get(lab, 0.0) for r in runs]
        summary[lab]["spread_frac_of_total_spread"] = round(
            (max(vals) - min(vals)) / total_spread, 3
        ) if total_spread else None
    out = {
        "what": "per-job wall decomposition of kg_pipeline_clustered "
                "across repeated idle runs (VERDICT r5 item 3)",
        "runs": runs,
        "totals": totals,
        "total_spread_frac": round(
            total_spread / statistics.median(totals), 4
        ),
        "driver_gaps": gaps,
        "gc_delta_ms": [r["gc_delta_ms"] for r in runs],
        "stage_summary": dict(
            sorted(summary.items(), key=lambda kv: -kv[1]["spread"])
        ),
        # run 1 pays JIT/codegen warmup for the whole session; the
        # warm view is what cross-round bench deltas should compare to
        "warm_totals": totals[1:],
        "warm_spread_frac": round(
            (max(totals[1:]) - min(totals[1:]))
            / statistics.median(totals[1:]), 4
        ) if len(totals) > 2 else None,
        "corpus_rows": CORPUS_ROWS,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
