"""Tie-break window semantics for the oracle-only operators
(VERDICT r5 item 6): A2/A3 per-doc keyword top-k and J2 related-docs
had oracle rows but no unit test pinning the deterministic ordering
(count desc, then name asc) against refactors — equal counts / equal
scores are exactly where a careless window change silently reorders
output and breaks cross-engine hash parity."""

from __future__ import annotations

from pdf_knowledge_extractor_spark.operators.concepts import (
    per_doc_top_keywords,
)
from pdf_knowledge_extractor_spark.operators.related import (
    related_documents,
)


def test_per_doc_top_keywords_equal_count_tiebreak(spark):
    # doc 1: three keywords ALL with count 2 -> rank order must be
    # lexicographic; k=2 must keep the two smallest
    rows = []
    for w in ("zeta", "alpha", "mid"):
        rows += [(1, w, "keyword"), (1, w, "keyword")]
    rows += [(1, "top", "keyword")] * 3           # clear winner
    rows += [(1, "notakw", "entity")]             # filtered out
    mentions = spark.createDataFrame(
        rows, "doc_id long, text string, concept_type string"
    )
    got = [
        (r["rank"], r["text"], r["cnt"])
        for r in per_doc_top_keywords(mentions, k=3)
        .orderBy("rank").collect()
    ]
    assert got == [(1, "top", 3), (2, "alpha", 2), (3, "mid", 2)]
    # the equal-count keyword dropped at the cap is the lexicographic
    # largest, not an arbitrary partition-order survivor
    got2 = {
        r["text"]
        for r in per_doc_top_keywords(mentions, k=2).collect()
    }
    assert got2 == {"top", "alpha"}


def test_related_docs_equal_share_tiebreak(spark):
    # doc 1 shares exactly 3 keywords with docs 9, 5 and 2 each ->
    # equal shared_kw_count; ranks must follow related_doc_id asc
    rows = []
    for d in (1, 9, 5, 2):
        rows += [(d, "kw_a"), (d, "kw_b"), (d, "kw_c")]
    # give doc 1 a strictly-better partner too (4 shared with doc 7)
    for d in (1, 7):
        rows += [(d, "kw_d")]
    rows += [(7, "kw_a"), (7, "kw_b"), (7, "kw_c")]
    posts = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["rank"], r["related_doc_id"], r["shared_kw_count"])
        for r in related_documents(
            posts, min_shared=3, top_k=10, max_df_fraction=None
        )
        .filter("doc_id = 1").orderBy("rank").collect()
    ]
    assert got == [(1, 7, 4), (2, 2, 3), (3, 5, 3), (4, 9, 3)]
    # cap at 2: the survivors of the equal-count tie are the smallest
    # related_doc_ids — deterministic under any partitioning
    got2 = [
        r["related_doc_id"]
        for r in related_documents(
            posts, min_shared=3, top_k=2, max_df_fraction=None
        )
        .filter("doc_id = 1").orderBy("rank").collect()
    ]
    assert got2 == [7, 2]
