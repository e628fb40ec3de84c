#!/usr/bin/env python
"""Candidate-volume census across corpus sizes (no rescore).

Measures the MinHash blocker's sub-cap candidate-pair volume
Σ n·(n−1)/2 — the direct driver of rescore cost — at each size, to
attribute data-size scaling exponents (BENCH/BASELINE.md 1.2M→2.4M)
to blocking-key densification from an artifact rather than from
hot-tail inference.

    python tools/census_scale.py 1200000 2400000 > BENCH/census_scale.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [300_000, 600_000]
    from pdf_knowledge_extractor_spark.corpus import (
        generate_corpus,
        heaps_vocab,
    )
    from pdf_knowledge_extractor_spark.operators.mentions import (
        keyword_mentions,
    )
    from pdf_knowledge_extractor_spark.operators.similarity import (
        banding_census,
    )
    from pdf_knowledge_extractor_spark.operators.tfidf import tfidf_longform
    from pdf_knowledge_extractor_spark.session import get_spark

    spark = get_spark("census-scale", cpus=32, shuffle_partitions=64)
    out = {}
    for n in sizes:
        corpus = generate_corpus(spark, n, n_vocab=heaps_vocab(n))
        km = keyword_mentions(corpus, "doc_id", "content")
        tfidf = tfidf_longform(km.select("doc_id", "text"), n_docs=n)
        rec = banding_census(tfidf)
        rec["rows"] = n
        rec["n_vocab"] = heaps_vocab(n)
        out[str(n)] = rec
        print(json.dumps(rec), file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    if len(sizes) == 2:
        a, b = (out[str(s)] for s in sizes)
        import math

        ratio = b["candidate_pairs_subcap"] / max(a["candidate_pairs_subcap"], 1)
        out["pair_growth_for_size_growth"] = {
            "size_ratio": sizes[1] / sizes[0],
            "subcap_pair_ratio": round(ratio, 3),
            "exponent": round(
                math.log(ratio) / math.log(sizes[1] / sizes[0]), 3
            ),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
