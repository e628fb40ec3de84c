"""Document clustering (C1/C2): KMeans + silhouette-chosen k.

Semantics reproduced from _perform_clustering / _find_optimal_clusters
(semantic_analyzer.py:450-509, 726-747): k searched over
2..min(10, n/2) by silhouette (seed 42), clusters labeled by top-3
centroid terms joined with " & " and title-cased
(semantic_analyzer.py:749-753); coherence = mean pairwise intra-cluster
cosine (:755-771); main_topics = top-5 centroid terms.

Spark-first: pyspark.ml KMeans over the hashed TF-IDF vectors;
the k-search loop is a driver-side loop of distributed fits (the model
state per k is tiny; the data never leaves executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_documents(
    vectors: DataFrame,
    k: int | None = None,
    k_min: int = 2,
    k_max: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, int, float]:
    """vectors(doc_id, features) -> (assignments(doc_id, cluster_id),
    chosen_k, silhouette). ``k=None`` runs the silhouette search."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator

    n = vectors.count()
    if n < 4:
        return (
            vectors.select("doc_id", F.lit(0).alias("cluster_id")),
            1,
            0.0,
        )
    vectors = vectors.persist()
    evaluator = ClusteringEvaluator(
        predictionCol="cluster_id", featuresCol="features", metricName="silhouette"
    )

    def fit(kk: int):
        km = KMeans(
            k=kk, seed=seed, featuresCol="features", predictionCol="cluster_id"
        )
        model = km.fit(vectors)
        preds = model.transform(vectors)
        return preds, evaluator.evaluate(preds)

    if k is not None:
        preds, score = fit(k)
        vectors.unpersist()
        return preds.select("doc_id", "cluster_id"), k, score

    best = None
    upper = min(k_max, max(k_min, n // 2))
    for kk in range(k_min, upper + 1):
        try:
            preds, score = fit(kk)
        except Exception:  # noqa: BLE001 — k > distinct points etc.
            continue
        if best is None or score > best[2]:
            best = (preds, kk, score)
    vectors.unpersist()
    if best is None:
        return (
            vectors.select("doc_id", F.lit(0).alias("cluster_id")), 1, 0.0
        )
    preds, kk, score = best
    return preds.select("doc_id", "cluster_id"), kk, score


def cluster_summaries(
    assignments: DataFrame,
    tfidf: DataFrame,
    top_terms: int = 10,
) -> DataFrame:
    """Per-cluster: centroid top terms (mean tfidf weight), label from
    top-3 (' & '-joined, initcap), main_topics = top-5, document_ids."""
    from pyspark.sql import Window

    joined = assignments.join(tfidf, "doc_id")
    term_means = joined.groupBy("cluster_id", "term").agg(
        F.avg("weight").alias("mean_w")
    )
    # rank on round(mean_w, 9): averaged doubles differ in the last ulp
    # between summation trees/engines, which must not reorder the top-k
    # (the concepts-agg convention; makes the derivation oracle-checkable)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(F.round("mean_w", 9)), F.asc("term")
    )
    top = (
        term_means.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_terms)
        .groupBy("cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "term", "mean_w"))
            ).alias("_top")
        )
    )
    members = assignments.groupBy("cluster_id").agg(
        F.array_sort(F.collect_set(F.col("doc_id").cast("string"))).alias(
            "document_ids"
        ),
        F.count("*").alias("n_documents"),
    )
    return (
        members.join(top, "cluster_id", "left")
        .select(
            "cluster_id",
            F.initcap(
                F.concat_ws(
                    " & ",
                    F.transform(
                        F.slice(F.col("_top"), 1, 3), lambda s: s["term"]
                    ),
                )
            ).alias("cluster_label"),
            "document_ids",
            "n_documents",
            F.map_from_entries(
                F.transform(
                    F.col("_top"), lambda s: F.struct(s["term"], s["mean_w"])
                )
            ).alias("centroid_features"),
            F.transform(F.slice(F.col("_top"), 1, 5), lambda s: s["term"]).alias(
                "main_topics"
            ),
        )
    )


def cluster_coherence(
    assignments: DataFrame, similarity_pairs: DataFrame
) -> DataFrame:
    """Mean intra-cluster pairwise similarity, reusing the J1 pair
    table (A10)."""
    a = assignments.select(
        F.col("doc_id").alias("doc1_id"), F.col("cluster_id").alias("c1")
    )
    b = assignments.select(
        F.col("doc_id").alias("doc2_id"), F.col("cluster_id").alias("c2")
    )
    return (
        similarity_pairs.join(a, "doc1_id")
        .join(b, "doc2_id")
        .filter(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("cluster_id"))
        .agg(F.avg("similarity_score").alias("coherence_score"))
    )
