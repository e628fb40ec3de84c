"""KMeans clustering (C1/C2), cluster summaries, coherence (A10)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pdf_knowledge_extractor_spark.operators.clustering import (
    cluster_coherence,
    cluster_documents,
    cluster_summaries,
)
from pdf_knowledge_extractor_spark.operators.mentions import keyword_mentions
from pdf_knowledge_extractor_spark.operators.similarity import (
    exact_cosine_pairs,
)
from pdf_knowledge_extractor_spark.operators.tfidf import (
    tfidf_longform,
    to_ml_vectors,
)


@pytest.fixture(scope="module")
def topic_corpus(spark):
    """Three well-separated vocabularies -> three natural clusters."""
    topics = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "spark shuffle partition executor driver cluster",
        2: "piano violin cello trumpet oboe clarinet",
    }
    rows = []
    for i in range(90):
        t = i % 3
        words = topics[t].split()
        # vary length and rotation so vectors differ within a topic
        body = " ".join(words[(i + j) % 6] for j in range(8 + i % 7))
        rows.append((i, f"{body} common filler", t))
    return spark.createDataFrame(
        rows, "doc_id long, text string, topic long"
    ).persist()


@pytest.fixture(scope="module")
def clustered(spark, topic_corpus):
    km = keyword_mentions(topic_corpus)
    tfidf = tfidf_longform(
        km.select("doc_id", "text"), n_docs=topic_corpus.count()
    ).persist()
    vectors = to_ml_vectors(tfidf, vocab_size=1 << 10)
    assignments, k, silhouette = cluster_documents(
        vectors, k_min=2, k_max=5
    )
    return topic_corpus, tfidf, assignments.persist(), k, silhouette


def test_silhouette_search_finds_three_clusters(clustered):
    _, _, assignments, k, silhouette = clustered
    assert k == 3
    assert silhouette > 0.5


def test_clusters_align_with_topics(clustered):
    corpus, _, assignments, _, _ = clustered
    joined = assignments.join(corpus.select("doc_id", "topic"), "doc_id")
    # every cluster should be topic-pure
    purity = (
        joined.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("topic").alias("n_topics"),
        )
        .collect()
    )
    assert all(r["n_topics"] == 1 for r in purity)


def test_cluster_summaries_shape(clustered):
    _, tfidf, assignments, k, _ = clustered
    summaries = cluster_summaries(assignments, tfidf).collect()
    assert len(summaries) == k
    for s in summaries:
        assert s["cluster_label"] and " & " in s["cluster_label"]
        assert len(s["document_ids"]) == s["n_documents"]
        assert 1 <= len(s["main_topics"]) <= 5


def test_cluster_coherence_high_for_pure_clusters(clustered):
    corpus, tfidf, assignments, _, _ = clustered
    pairs = exact_cosine_pairs(tfidf, threshold=0.0)
    coh = cluster_coherence(assignments, pairs).collect()
    assert coh
    for r in coh:
        assert r["coherence_score"] > 0.3
