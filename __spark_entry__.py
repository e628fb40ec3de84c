"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end KG pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` expose every operator from
SURVEY.md §2 with a DuckDB oracle — including the blocked/iterative
ops (round 2): minhash dedup is checked against the exact-Jaccard
ground truth, simhash + hyperplane-LSH + multi-probe IVF are
re-derived in SQL from md5-based hashes, connected components against
a recursive-CTE fixpoint, KMeans against its partition invariant, and
the full pipeline against composed per-predicate count CTEs. Round 3
adds cluster_summaries_fixed (the label/centroid/topic derivation
behind kmeans_summaries, hash-matched under deterministic
assignments), ann_ivf_kmeans_topk (the KMeans-shaped IVF with a
pinned quantizer), graph_stats (node/edge counts + density),
media_features (the multimodal mapInPandas path — sha256-derived
values re-computed by DuckDB's sha256()), and sessionize_stream (the
applyInPandasWithState session operator driven as a real file-source
streaming query, matched against the batch SQL fixpoint's closed
sessions; likewise windowed_stream_counts and stream_user_counts for
the watermark and running-counter operators). Round 4 adds
kg_pipeline_clustered (the with_clusters=True composition under
deterministic injected assignments — per-predicate counts incl.
in_cluster) and cluster_relation_fixed (the cluster_summaries ⋈
cluster_coherence relation with reference-exact coherence semantics:
mean positive intra-cluster pairwise cosine, singletons 1.0). The one
remaining rows-only query is
kmeans_summaries (cluster memberships are not SQL-derivable; its
partition invariant and its summary logic are oracle-gated
separately).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_knowledge_extractor_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full knowledge-graph
    construction pipeline (enrich -> mentions -> tfidf -> concepts +
    similarity join -> graph) materialized as (subj, pred, obj, weight,
    prov) triples."""
    return entry_queries.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.get_queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.get_oracles()
