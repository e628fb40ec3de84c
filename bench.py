#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the flagship
end-to-end KG pipeline over the deterministic synthetic source-code
corpus, and prints ONE JSON line:

{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "triples": N,
 "triples_per_sec": N}

NOISE CONTROL (round 3): this host shows ±40% cold-run variance (~6%
steal, VM neighbors), which made BENCH_rN files incomparable across
rounds. Every headline query now runs $PKE_BENCH_REPEATS times
(default 3) and reports the MEDIAN; the flagship pipeline runs
$PKE_BENCH_PIPELINE_REPEATS times (default 2) and reports the final
WARM pass (a real cluster pays JVM/codegen warmup once per executor
lifetime, not per job). All raw runs ship in "queries_runs" so the
distribution is on the record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_knowledge_extractor_spark import entry_queries
from pdf_knowledge_extractor_spark.corpus import generate_corpus
from pdf_knowledge_extractor_spark.operators.ann import (
    release_checkpointed_results,
)
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

    repeats = int(os.environ.get("PKE_BENCH_REPEATS", "3"))
    pipe_repeats = int(os.environ.get("PKE_BENCH_PIPELINE_REPEATS", "2"))
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}

    def measure(name: str, thunk, n: int, record: str = "median"):
        runs = []
        out = None
        for _ in range(max(n, 1)):
            t0 = time.perf_counter()
            out = thunk()
            runs.append(round(time.perf_counter() - t0, 3))
        all_runs[name] = runs
        timings[name] = round(
            statistics.median(runs) if record == "median" else runs[-1], 3
        )
        return out

    t_total0 = time.perf_counter()

    for name in HEADLINE:
        measure(name, lambda q=qs[name]: q(spark, sf_dir).count(), repeats)
    # the dedup/similarity rows above localCheckpoint their result pair
    # tables (_finalize); release the blocks now that they're counted —
    # leftover checkpoint storage measurably taxed later rows (the
    # round-4 sim_minhash_corpus 5.3->9.5s regression; attribution in
    # BENCH/attrib_regression_r5.json)
    release_checkpointed_results()

    # flagship: full KG pipeline over the synthetic code corpus.
    # Repeated runs re-plan and re-execute everything (fresh lineage);
    # the recorded number is the final WARM pass, with the cold pass on
    # the record in queries_runs. Caches are cleared between passes so
    # repeated persists don't accumulate; the LAST pass keeps its cache
    # so the sim rows below reuse its tfidf.
    corpus = generate_corpus(spark, corpus_rows)
    state: dict = {}

    def run_kg():
        if state:
            spark.catalog.clearCache()
            release_checkpointed_results()
        cfg = PipelineConfig(similarity_strategy="minhash")
        res = run_pipeline(
            spark, corpus, cfg, id_col="doc_id", text_col="content",
            lang_col="lang",
        )
        state["res"] = res
        state["triples"] = res["triples"].count()
        return res

    measure("kg_pipeline", run_kg, pipe_repeats, record="last")
    res, n_triples = state["res"], state["triples"]

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
    measure(
        "sim_minhash_corpus",
        lambda: minhash_blocked_cosine_pairs(tfidf, threshold=0.7).count(),
        repeats,
    )
    # the same blocker with the pipeline's production bucket cap — the
    # round-3 scale guard; on this corpus the near-dup clusters are
    # small so the cap is recall-neutral and the row isolates its cost
    measure(
        "sim_minhash_capped_corpus",
        lambda: minhash_blocked_cosine_pairs(
            tfidf, threshold=0.7, max_bucket_size=400
        ).count(),
        repeats,
    )
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
    measure(
        f"sim_prefix_corpus_{prefix_docs // 1000}k",
        lambda: prefix_cosine_pairs(sub, threshold=0.7).count(),
        repeats,
    )

    # the CLUSTERED pipeline end-to-end (VERDICT r3 item 2): real
    # KMeans (k pinned to 8 — production runs at known k; the
    # silhouette search is a k-fold driver loop benched in pytest) +
    # cluster summaries + the O(nnz) centroid coherence + in_cluster
    # triples. Median of `repeats` fresh passes (VERDICT r4 item 4 —
    # the single-run recording was noise-limited for r4->r5 compares)
    def run_kg_clustered():
        spark.catalog.clearCache()
        release_checkpointed_results()
        cfg = PipelineConfig(
            similarity_strategy="minhash",
            with_clusters=True,
            cluster_k=8,
            coherence_mode="centroid",
        )
        res = run_pipeline(
            spark, corpus, cfg, id_col="doc_id", text_col="content",
            lang_col="lang",
        )
        state["clustered_triples"] = res["triples"].count()
        res["clusters"].count()
        return res

    measure("kg_pipeline_clustered", run_kg_clustered, repeats)

    total = round(time.perf_counter() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_pipeline",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_runs": all_runs,
                "repeats": repeats,
                "pipeline_repeats": pipe_repeats,
                "sf": sf,
                "corpus_rows": corpus_rows,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / timings["kg_pipeline"], 1),
                "clustered_triples": state.get("clustered_triples"),
                "cpus": cpus,
                "profile": profile,
            }
        )
    )


if __name__ == "__main__":
    main()
