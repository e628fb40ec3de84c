#!/usr/bin/env python
"""Corpus-size scaling evidence: same job, same parallelism, two input
sizes — the round-3 check that the capped banding blocker keeps the
flagship pipeline near-linear in corpus rows (round 2 measured the
UNCAPPED pipeline going superlinear at 600k rows on the 500-word
synthetic vocabulary; the fix is PipelineConfig.similarity_max_bucket).

    python tools/bench_corpus_scale.py 300000 600000
Separate JVM per point (subprocess) so neither run inherits the
other's caches.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

def measured_run(rows: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pdf_knowledge_extractor_spark.corpus import generate_corpus
    from pdf_knowledge_extractor_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from pdf_knowledge_extractor_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"corpus-scale-{rows}", cpus=cpus)
    generate_corpus(spark, 2000).count()  # warmup outside the window
    t0 = time.perf_counter()
    corpus = generate_corpus(spark, rows)
    res = run_pipeline(
        spark, corpus, PipelineConfig(similarity_strategy="minhash"),
        id_col="doc_id", text_col="content", lang_col="lang",
    )
    n = res["triples"].count()
    dt = time.perf_counter() - t0
    spark.stop()
    return {"rows": rows, "seconds": round(dt, 2), "triples": n,
            "triples_per_sec": round(n / dt, 1),
            "rows_per_sec": round(rows / dt, 1)}

def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print(json.dumps(measured_run(int(sys.argv[2]))))
        return
    sizes = [int(a) for a in sys.argv[1:]] or [300_000, 600_000]
    results = []
    for rows in sizes:
        out = subprocess.run(
            [sys.executable, __file__, "--run", str(rows)],
            capture_output=True, text=True, check=True,
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(results[-1], flush=True)
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        ratio = (hi["rows"] / lo["rows"]) / (hi["seconds"] / lo["seconds"])
        print(json.dumps({"size_scaling_efficiency": round(ratio, 3),
                          "points": results}))

if __name__ == "__main__":
    main()
