"""Round-7 similarity-operator decomposition at pipeline scale.

Builds the pipeline's tfidf long form for an N-row synthetic corpus
(untimed, persisted), then times the minhash blocker's stages
separately: AUTO stop-list (census+probe), banded-row construction
(signature HOFs), bucket census, and the candidate join + rescore.
Also times the three bench configurations end-to-end on the warm
tfidf (auto / fullsig / capped), matching bench.py's sim rows.

Usage: python tools/profile_sim_r07.py [rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pdf_knowledge_extractor_spark.corpus import generate_corpus  # noqa: E402
from pdf_knowledge_extractor_spark.operators import similarity as S  # noqa: E402
from pdf_knowledge_extractor_spark.operators.ann import (  # noqa: E402
    release_checkpointed_results,
)
from pdf_knowledge_extractor_spark.operators.mentions import (  # noqa: E402
    keyword_mentions,
)
from pdf_knowledge_extractor_spark.operators.tfidf import (  # noqa: E402
    tfidf_longform,
)
from pdf_knowledge_extractor_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pke-sim-profile-r07", cpus=cpus)
    sc = spark.sparkContext

    corpus = generate_corpus(spark, rows)
    n_docs = corpus.count()
    km = keyword_mentions(corpus, "doc_id", "content")
    tfidf = tfidf_longform(
        km.select("doc_id", F.col("text")), n_docs=n_docs, normalize=True
    ).persist()
    tfidf.count()
    out: dict = {"rows": rows}

    # --- stage decomposition (auto stop-list path) -------------------
    t0 = time.perf_counter()
    sc.setJobDescription("simprof: auto stoplist")
    stats: dict = {}
    exclude = S._auto_signature_stoplist(tfidf, 0.7, n_docs=n_docs,
                                         stats=stats)
    out["stoplist_s"] = round(time.perf_counter() - t0, 2)
    out["stoplist_stats"] = {
        k: v for k, v in stats.items() if isinstance(v, (int, float, bool))
    }

    t0 = time.perf_counter()
    sc.setJobDescription("simprof: banded rows (signature HOFs)")
    banded = S._banded_rows(tfidf, 60, 12, signature_exclude=exclude)
    banded = banded.persist()
    n_banded = banded.count()
    out["banding_s"] = round(time.perf_counter() - t0, 2)
    out["banded_rows"] = n_banded

    t0 = time.perf_counter()
    sc.setJobDescription("simprof: bucket census")
    census = banded.groupBy("band", "band_hash").agg(
        F.count("*").alias("_n")
    )
    agg = census.agg(
        F.count("*"),
        F.coalesce(F.sum(
            F.when(F.col("_n") <= 400,
                   F.col("_n").cast("long") * (F.col("_n") - 1) / 2)
            .otherwise(0.0)).cast("long"), F.lit(0)),
        F.coalesce(F.sum((F.col("_n") > 400).cast("long")), F.lit(0)),
    ).first()
    out["census_s"] = round(time.perf_counter() - t0, 2)
    out["buckets"] = int(agg[0])
    out["subcap_pairs"] = int(agg[1])
    out["buckets_over_400"] = int(agg[2])

    t0 = time.perf_counter()
    sc.setJobDescription("simprof: self-join + dedup")
    b1 = banded.select(F.col("doc_id").alias("doc1_id"), "band", "band_hash")
    b2 = banded.select(F.col("doc_id").alias("doc2_id"), "band", "band_hash")
    from pdf_knowledge_extractor_spark.tuning import hinted
    cand = S._dedup_pairs(
        b1.join(b2.transform(hinted), ["band", "band_hash"])
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .select("doc1_id", "doc2_id")
    ).persist()
    n_cand = cand.count()
    out["candjoin_s"] = round(time.perf_counter() - t0, 2)
    out["candidates"] = n_cand

    t0 = time.perf_counter()
    sc.setJobDescription("simprof: rescore")
    n_pairs = S._rescore_candidates(cand, tfidf, 0.7).count()
    out["rescore_s"] = round(time.perf_counter() - t0, 2)
    out["pairs"] = n_pairs
    cand.unpersist()
    banded.unpersist()
    print(json.dumps(out), flush=True)

    # --- end-to-end bench-row replicas on warm tfidf -----------------
    for name, kwargs in (
        ("sim_auto", {}),
        ("sim_fullsig", {"signature_max_df": None}),
        ("sim_capped", {"max_bucket_size": 400}),
    ):
        for i in range(2):
            t0 = time.perf_counter()
            sc.setJobDescription(f"simprof: e2e {name} pass{i}")
            n = S.minhash_blocked_cosine_pairs(
                tfidf, threshold=0.7, **kwargs
            ).count()
            release_checkpointed_results()
            print(json.dumps({
                f"{name}_pass{i}_s": round(time.perf_counter() - t0, 2),
                "pairs": n,
            }), flush=True)


if __name__ == "__main__":
    main()
