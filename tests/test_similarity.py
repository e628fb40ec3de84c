"""Similarity join: exact vs numpy golden; prefix-filtered == exact;
LSH recall >= 0.95 (SURVEY.md §7.2 item 5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_knowledge_extractor_spark.operators.mentions import keyword_mentions
from pdf_knowledge_extractor_spark.operators.similarity import (
    exact_cosine_pairs,
    lsh_cosine_pairs,
    prefix_cosine_pairs,
)
from pdf_knowledge_extractor_spark.operators.tfidf import (
    tfidf_longform,
    to_ml_vectors,
)
from tests.golden_reference import golden_similarities


def _tfidf(small_corpus):
    km = keyword_mentions(small_corpus, "doc_id", "content")
    return tfidf_longform(
        km.select("doc_id", "text"), n_docs=small_corpus.count()
    ).persist()


def _pairs_dict(df):
    return {
        (r["doc1_id"], r["doc2_id"]): r["similarity_score"] for r in df.collect()
    }


def test_exact_pairs_match_numpy_golden(spark, small_corpus):
    tfidf = _tfidf(small_corpus)
    got = _pairs_dict(exact_cosine_pairs(tfidf, 0.7))
    docs = [
        (r["doc_id"], r["content"], r["lang"]) for r in small_corpus.collect()
    ]
    expected = golden_similarities(docs, 0.7)
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9
    assert len(expected) > 0, "corpus must contain engineered near-dups"


def test_prefix_equals_exact(spark, small_corpus):
    tfidf = _tfidf(small_corpus)
    exact = _pairs_dict(exact_cosine_pairs(tfidf, 0.7))
    pref = _pairs_dict(prefix_cosine_pairs(tfidf, 0.7))
    assert set(exact) == set(pref)
    for k in exact:
        assert abs(exact[k] - pref[k]) < 1e-9


def test_lsh_recall(spark, small_corpus):
    tfidf = _tfidf(small_corpus)
    exact = _pairs_dict(exact_cosine_pairs(tfidf, 0.7))
    vectors = to_ml_vectors(tfidf, vocab_size=1 << 12)
    lsh = _pairs_dict(lsh_cosine_pairs(vectors, 0.7, tfidf=tfidf))
    # precision is exact by construction (rescoring); recall >= 0.95
    assert set(lsh) <= set(exact) or all(
        abs(lsh[k] - exact.get(k, -1)) < 1e-9 for k in lsh
    )
    recall = len(set(lsh) & set(exact)) / max(len(exact), 1)
    assert recall >= 0.95, f"LSH recall {recall}"
