#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the flagship
end-to-end KG pipeline (LSH similarity path) over the deterministic
synthetic source-code corpus, and prints ONE JSON line:

{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "triples": N,
 "triples_per_sec": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_knowledge_extractor_spark import entry_queries
from pdf_knowledge_extractor_spark.corpus import generate_corpus
from pdf_knowledge_extractor_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from pdf_knowledge_extractor_spark.session import get_spark

# headline per-operator queries (similar_pairs excluded here: the
# driver documents table has a 24-word vocabulary, making all-pairs
# output O(n^2) by construction; the exact path is correctness-gated
# at sf0.01 via the oracle and the scale path is benched in the
# pipeline below)
HEADLINE = (
    "tpch_q1",
    "revenue_by_nation",
    "events_hourly",
    "sessionize",
    "doc_stats",
    "quality_scores",
    "doc_type",
    "sentiment",
    "keywords_topk",
    "concepts_agg",
    "tfidf_topk",
    # related_docs excluded: the driver documents table has a 24-word
    # vocabulary where every keyword appears in ~70% of docs, making the
    # posting self-join Sigma df^2 ~ n^2 by construction; the operator is
    # correctness-gated at sf0.01 and benched on the realistic-vocabulary
    # corpus inside kg_pipeline
    "contains_triples",
    "exact_dedup",
    # training-data-pipeline extensions (cheap at sf0.1; ann_topk's
    # brute-force path is excluded — it is the rescoring primitive,
    # benched indirectly via the blocked variants)
    "minhash_dedup",
    "simhash_pairs",
    "ngram_jaccard",
    "lang_id",
    "text_validity",
    "doc_chunks",
    "rolling_trend",
    "events_pivot",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    corpus_rows = int(os.environ.get("PKE_BENCH_CORPUS_ROWS", str(int(500_000 * sf))))

    # PRODUCTION confs by default (the engine's own session defaults:
    # AQE on, whole-stage codegen on) — what a real cluster would run,
    # where janino compile cost amortizes over 100x more data per
    # stage. PKE_BENCH_PROFILE=tuned re-enables the local-only
    # NO_CODEGEN/AQE-off profile for comparison; the measured delta per
    # profile lives in BENCH/BASELINE.md.
    profile = os.environ.get("PKE_BENCH_PROFILE", "production")
    extra_conf = (
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        }
        if profile == "tuned"
        else {}
    )
    spark = get_spark("pke-bench", cpus=cpus, extra_conf=extra_conf)
    qs = entry_queries.get_queries()

    # untimed warmup: one small scan+agg job to load JVM/codegen/
    # parquet-reader classes. Measured: the first job of a fresh JVM
    # pays ~5s of class loading regardless of query (tpch_q1 5.5s cold
    # vs 0.75s warm); a real cluster amortizes this once per executor
    # lifetime, not per query.
    from pyspark.sql import functions as _F

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
        _F.sum("l_quantity")
    ).collect()

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()

    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship: full KG pipeline over the synthetic code corpus
    t0 = time.perf_counter()
    corpus = generate_corpus(spark, corpus_rows)
    cfg = PipelineConfig(similarity_strategy="minhash")
    res = run_pipeline(
        spark, corpus, cfg, id_col="doc_id", text_col="content",
        lang_col="lang",
    )
    n_triples = res["triples"].count()
    dt = time.perf_counter() - t0
    timings["kg_pipeline"] = round(dt, 3)

    # similarity-strategy bench rows on the REALISTIC-vocabulary corpus
    # (the driver documents table's 24-word vocabulary makes any
    # similarity join O(n^2) by construction, so the quadratic-risk
    # operators are measured here instead): reuse the pipeline's
    # persisted tfidf so the rows time the pair joins themselves.
    from pdf_knowledge_extractor_spark.operators.similarity import (
        minhash_blocked_cosine_pairs,
        prefix_cosine_pairs,
    )

    tfidf = res["tfidf"]
    t0 = time.perf_counter()
    minhash_blocked_cosine_pairs(tfidf, threshold=0.7).count()
    timings["sim_minhash_corpus"] = round(time.perf_counter() - t0, 3)
    # prefix filtering is EXACT but Σ prefix_df² — measured 225s on the
    # full 50k corpus (the flat-weight content defeats the prefix
    # bound; that is why minhash banding is the default scale path).
    # Bench it on a 10k-doc slice so the row tracks regressions without
    # dominating the suite.
    prefix_docs = 10_000
    sub = tfidf.join(
        _F.broadcast(
            corpus.select("doc_id").orderBy("doc_id").limit(prefix_docs)
        ),
        "doc_id",
    )
    t0 = time.perf_counter()
    prefix_cosine_pairs(sub, threshold=0.7).count()
    timings[f"sim_prefix_corpus_{prefix_docs // 1000}k"] = round(
        time.perf_counter() - t0, 3
    )

    total = round(time.perf_counter() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_pipeline",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "corpus_rows": corpus_rows,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / dt, 1),
                "cpus": cpus,
                "profile": profile,
            }
        )
    )


if __name__ == "__main__":
    main()
