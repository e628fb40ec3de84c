"""ANN over embeddings: brute-force vs numpy; LSH-bucketed recall."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from pdf_knowledge_extractor_spark.operators.ann import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(10, 16))
    rows = []
    vid = 0
    for c in range(10):
        for _ in range(20):
            v = base[c] + rng.normal(scale=0.3, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).persist()


def test_brute_force_matches_numpy(spark, embeddings):
    got = brute_force_topk(embeddings, k=3).collect()
    data = {r["vec_id"]: np.array(r["embedding"]) for r in embeddings.collect()}
    ids = sorted(data)
    mat = np.stack([data[i] for i in ids])
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    np.fill_diagonal(sims, -np.inf)
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r["rank"])
        expect_order = np.argsort(-sims[qid])[:3]
        got_ids = [r["nbr_id"] for r in rows]
        # cosine values must match numpy exactly (same formula)
        for r in rows:
            assert abs(r["cosine"] - sims[qid][r["nbr_id"]]) < 1e-9
        # top-3 sets match (ties possible, compare score sets)
        exp_scores = sorted(np.round(sims[qid][expect_order], 9), reverse=True)
        got_scores = sorted((round(r["cosine"], 9) for r in rows), reverse=True)
        assert exp_scores == got_scores


def test_lsh_bucketed_recall(spark, embeddings):
    exact = {
        (r["query_id"], r["nbr_id"])
        for r in brute_force_topk(embeddings, k=3).collect()
        if r["rank"] == 1
    }
    approx = {
        (r["query_id"], r["nbr_id"])
        for r in lsh_bucketed_topk(
            embeddings, k=3, n_bits=8, n_tables=8, dim=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"top-1 recall via LSH buckets {recall}"


def test_embedding_near_dup_pairs(spark, embeddings):
    pairs = embedding_near_dup_pairs(embeddings, threshold=0.9).collect()
    assert pairs, "same-cluster vectors should exceed 0.9 cosine"
    for r in pairs:
        assert r["cosine"] >= 0.9


def test_ivf_topk_recall(spark, embeddings):
    from pdf_knowledge_extractor_spark.operators.ann import ivf_topk

    exact_top1 = {
        (r["query_id"], r["nbr_id"])
        for r in brute_force_topk(embeddings, k=3).collect()
        if r["rank"] == 1
    }
    ivf = {
        (r["query_id"], r["nbr_id"])
        for r in ivf_topk(embeddings, k=3, n_lists=8, n_probe=2).collect()
    }
    recall = len(exact_top1 & ivf) / len(exact_top1)
    # clustered data: the true nearest neighbor lives in the same or an
    # adjacent IVF list virtually always
    assert recall >= 0.9, f"IVF top-1 recall {recall}"


def test_scoped_checkpoint_release(spark, embeddings):
    """ADVICE r5 #2: releasing ONE owned result must not unpersist
    other still-held finalized results — the old blanket drain
    truncated every sibling's lineage (their next action failed with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, no recompute possible)."""
    from pdf_knowledge_extractor_spark.operators.ann import (
        release_checkpointed_results,
    )

    release_checkpointed_results()  # drain prior tests' results
    a = lsh_bucketed_topk(embeddings, k=3)
    b = lsh_bucketed_topk(embeddings, k=5)
    n_a = a.count()
    # scoped release of a only: exactly one checkpoint goes
    assert release_checkpointed_results(a) == 1
    # b is untouched and still actionable after the sibling's release
    assert b.count() > n_a
    # releasing a again is a no-op; the bare drain takes the rest
    assert release_checkpointed_results(a) == 0
    assert release_checkpointed_results() == 1
