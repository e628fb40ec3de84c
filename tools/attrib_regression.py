#!/usr/bin/env python
"""Attribute the round-4 `sim_minhash_corpus` bench regression
(BENCH_r03 5.34s -> BENCH_r04 9.54s median on unchanged code).

Hypothesis (VERDICT r4 "What's wrong" #1): `_finalize`'s eager
localCheckpoints — the result pair tables of every dedup/similarity
call — park RDD blocks in executor storage for the session lifetime.
`spark.catalog.clearCache()` between pipeline passes does not remove
them (it only walks the DataFrame cache manager), so by the time the
uncapped `sim_minhash_corpus` row runs, the JVM carries the
checkpointed output of the headline dedup rows plus two kg_pipeline
passes, taxing storage memory / GC on an identical plan.

Protocol: replicate the exact bench prefix that precedes the regressed
row — warmup scan, 3x{minhash_dedup, simhash_pairs, ngram_jaccard} on
the sf documents table, two kg_pipeline passes on the 50k synthetic
corpus — then measure the uncapped `minhash_blocked_cosine_pairs` row
3x. Two arms, separate JVMs:

  --arm leak      status quo: no release (round-4 behavior)
  --arm release   `release_checkpointed_results()` after the headline
                  rows and between pipeline passes (round-5 fix)

Each arm reports the RDD storage census (blocks / bytes) right before
the measured row plus the three measured run times. Run both:

  python tools/attrib_regression.py            # both arms + verdict
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_ROWS = int(os.environ.get("PKE_ATTRIB_ROWS", "50000"))


def storage_census(sc) -> dict:
    infos = sc._jsc.sc().getRDDStorageInfo()
    return {
        "rdds": len(infos),
        "mem_bytes": sum(i.memSize() for i in infos),
        "disk_bytes": sum(i.diskSize() for i in infos),
        "cached_partitions": sum(i.numCachedPartitions() for i in infos),
    }


def run_arm(arm: str) -> dict:
    from pyspark.sql import functions as F

    from pdf_knowledge_extractor_spark import entry_queries
    from pdf_knowledge_extractor_spark.corpus import generate_corpus
    from pdf_knowledge_extractor_spark.operators.ann import (
        release_checkpointed_results,
    )
    from pdf_knowledge_extractor_spark.operators.similarity import (
        minhash_blocked_cosine_pairs,
    )
    from pdf_knowledge_extractor_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from pdf_knowledge_extractor_spark.session import get_spark

    release = arm == "release"
    spark = get_spark(f"attrib-{arm}", cpus=CPUS)
    sc = spark.sparkContext
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").agg(
        F.sum("l_quantity")
    ).collect()

    qs = entry_queries.get_queries()
    for name in ("minhash_dedup", "simhash_pairs", "ngram_jaccard"):
        for _ in range(3):
            qs[name](spark, SF_DIR).count()
    if release:
        release_checkpointed_results()

    corpus = generate_corpus(spark, CORPUS_ROWS)
    res = None
    for i in range(2):
        if i:
            spark.catalog.clearCache()
            if release:
                release_checkpointed_results()
        res = run_pipeline(
            spark, corpus, PipelineConfig(similarity_strategy="minhash"),
            id_col="doc_id", text_col="content", lang_col="lang",
        )
        res["triples"].count()

    census = storage_census(sc)
    tfidf = res["tfidf"]
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        minhash_blocked_cosine_pairs(tfidf, threshold=0.7).count()
        runs.append(round(time.perf_counter() - t0, 3))
    out = {
        "arm": arm,
        "storage_before_row": census,
        "sim_minhash_corpus_runs": runs,
        "median": round(statistics.median(runs), 3),
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--arm":
        print(json.dumps(run_arm(sys.argv[2])))
        return
    results = {}
    for arm in ("leak", "release"):
        out = subprocess.run(
            [sys.executable, __file__, "--arm", arm],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        results[arm] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(results[arm]), flush=True)
    print(json.dumps({
        "leak_median": results["leak"]["median"],
        "release_median": results["release"]["median"],
        "delta_sec": round(
            results["leak"]["median"] - results["release"]["median"], 3
        ),
        "leak_storage": results["leak"]["storage_before_row"],
        "release_storage": results["release"]["storage_before_row"],
    }))


if __name__ == "__main__":
    main()
