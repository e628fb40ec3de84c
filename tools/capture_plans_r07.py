"""Capture .explain("formatted") output for the round-7-touched
queries/operators, for the judge's plan-claim checks.

Usage: python tools/capture_plans_r07.py <outdir> [repo_root]

Run once against the round-start tree (a git worktree of the r6 tag)
with outdir plans/r07-before-staging, and once against HEAD with
outdir plans/r07; the driver-facing files are <query>_before.txt /
<query>_after.txt in plans/r07.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
sys.path.insert(0, root)

from pyspark.sql import functions as F  # noqa: E402

from pdf_knowledge_extractor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-capture-r07", cpus=8)

    # the dedup/similarity operators eagerly localCheckpoint their
    # result (_finalize), which makes the query-level explain an
    # opaque ExistingRDD scan — neutralize it for plan capture so the
    # real operator plan is visible (and nothing expensive executes)
    from pdf_knowledge_extractor_spark.operators import ann as _ann

    _ann._finalize = lambda result, *cached: result
    import pdf_knowledge_extractor_spark.operators.dedup as _dedup

    _dedup._finalize = _ann._finalize
    try:
        import pdf_knowledge_extractor_spark.operators.similarity as _sim

        _sim._finalize = _ann._finalize  # type: ignore[attr-defined]
    except Exception:
        pass

    from pdf_knowledge_extractor_spark import entry_queries

    qs = entry_queries.get_queries()
    plans: dict[str, str] = {}

    # touched headline queries (query-level plans)
    for name in ("simhash_pairs", "ngram_jaccard", "minhash_dedup",
                 "concepts_agg", "contains_triples", "tfidf_topk",
                 "keywords_topk"):
        plans[name] = explain_str(qs[name](spark, SF_DIR))

    # pipeline-internal operators (the bench's corpus rows): plan the
    # minhash similarity join and the concepts stage over a small
    # corpus so the operator shape is visible without a long run
    from pdf_knowledge_extractor_spark.corpus import generate_corpus
    from pdf_knowledge_extractor_spark.operators.mentions import (
        all_mentions,
        keyword_mentions,
    )
    from pdf_knowledge_extractor_spark.operators.similarity import (
        minhash_blocked_cosine_pairs,
    )
    from pdf_knowledge_extractor_spark.operators.tfidf import tfidf_longform

    corpus = generate_corpus(spark, 2000)
    km = keyword_mentions(corpus, "doc_id", "content")
    tfidf = tfidf_longform(
        km.select("doc_id", F.col("text")), n_docs=2000
    ).persist()
    tfidf.count()
    plans["sim_minhash_corpus"] = explain_str(
        minhash_blocked_cosine_pairs(tfidf, threshold=0.7)
    )
    ments = all_mentions(corpus, id_col="doc_id", text_col="content",
                         lang_col="lang")
    try:
        from pdf_knowledge_extractor_spark.operators.concepts import (
            aggregate_concepts_canonical,
        )

        plans["pipeline_concepts"] = explain_str(
            aggregate_concepts_canonical(ments, 2, 100)
        )
    except ImportError:
        from pdf_knowledge_extractor_spark.operators.concepts import (
            aggregate_concepts,
            canonical_merge,
        )

        plans["pipeline_concepts"] = explain_str(
            canonical_merge(aggregate_concepts(ments, 1, None), 2, 100)
        )

    suffix = os.environ.get("PKE_PLAN_SUFFIX", "after")
    for name, text in plans.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print("wrote", path)


if __name__ == "__main__":
    main()
