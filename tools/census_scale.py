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
    # PKE_CENSUS_VOCAB: "heaps" (default, V = 30·√N — Heaps-law
    # growth, densifies sub-linearly) or "linear:K" (V = N/K — a
    # non-densifying corpus where random band collisions stay flat
    # and only the engineered near-dup pairs, themselves ∝ N, remain)
    vocab_policy = os.environ.get("PKE_CENSUS_VOCAB", "heaps")
    # PKE_CENSUS_BODY_WORDS: body length per doc (default 40 — the
    # legacy short-doc corpus; real source files run 100s of tokens,
    # which collapses random Zipf-head band collisions)
    body_words = int(os.environ.get("PKE_CENSUS_BODY_WORDS", "40"))
    # PKE_CENSUS_MAX_DF_FRAC: if set, band only terms with
    # df <= frac*N (signature df stop-list experiment: Zipf-head
    # terms carry no discriminative similarity signal but drive the
    # superlinear random-collision volume)
    max_df_frac = float(os.environ.get("PKE_CENSUS_MAX_DF_FRAC", "0"))
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
        if vocab_policy.startswith("linear:"):
            n_vocab = max(n // int(vocab_policy.split(":")[1]), 500)
        else:
            n_vocab = heaps_vocab(n)
        corpus = generate_corpus(
            spark, n, n_vocab=n_vocab, body_words=body_words
        )
        km = keyword_mentions(corpus, "doc_id", "content")
        tfidf = tfidf_longform(km.select("doc_id", "text"), n_docs=n)
        if max_df_frac:
            from pyspark.sql import functions as F

            tfidf = tfidf.filter(F.col("df") <= max_df_frac * n)
        exclude = None
        stop_stats: dict = {}
        if os.environ.get("PKE_CENSUS_AUTO_STOPLIST") == "1":
            # census the round-6 DEFAULT blocker: the probe-verified
            # signature stop-list (recall-safe head-term exclusion)
            from pdf_knowledge_extractor_spark.operators.similarity import (
                _auto_signature_stoplist,
            )

            tfidf = tfidf.persist()
            exclude = _auto_signature_stoplist(
                tfidf, 0.7, n_docs=n, stats=stop_stats
            )
        rec = banding_census(tfidf, signature_exclude=exclude)
        rec.update({f"stoplist_{k}": v for k, v in stop_stats.items()})
        rec["rows"] = n
        rec["n_vocab"] = n_vocab
        rec["vocab_policy"] = vocab_policy
        rec["body_words"] = body_words
        rec["max_df_frac"] = max_df_frac
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
