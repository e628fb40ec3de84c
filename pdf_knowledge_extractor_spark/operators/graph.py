"""Knowledge-graph construction (G1) + graph stats (G3/A11).

Semantics reproduced from _build_knowledge_graph
(semantic_analyzer.py:511-572): node set = documents (type 'document',
props filename/size/pages) ∪ concepts (id 'concept_<text_>', type =
concept_type, props frequency/importance); edge set =
contains(doc -> concept, weight = concept importance,
semantic_analyzer.py:545-554) ∪ similar_to(doc <-> doc, weight =
similarity, :556-572). Density = 2E/(N(N-1)) (nx.density, :176).

Everything is pure DataFrame construction — the edge table IS the
(subj, pred, obj) triple core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.operators.concepts import concept_id


def document_nodes(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.lit("document").alias("node_type"),
        F.col(id_col).cast("string").alias("label"),
    )


def concept_nodes(concepts: DataFrame) -> DataFrame:
    return concepts.select(
        concept_id(F.col("text")).alias("id"),
        F.lit("concept").alias("node_type"),
        F.col("text").alias("label"),
    )


def contains_edges(concepts: DataFrame) -> DataFrame:
    """concept.document_ids explode -> contains(doc, concept) edges
    weighted by concept importance (J6)."""
    return concepts.select(
        F.explode("document_ids").alias("src"),
        F.lit("contains").alias("edge_type"),
        concept_id(F.col("text")).alias("dst"),
        F.col("importance").alias("weight"),
    ).select(F.col("src").cast("string").alias("src"), "edge_type", "dst", "weight")


def similarity_edges(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.col("doc1_id").cast("string").alias("src"),
        F.lit("similar_to").alias("edge_type"),
        F.col("doc2_id").cast("string").alias("dst"),
        F.col("similarity_score").alias("weight"),
    )


def build_graph(
    docs: DataFrame,
    concepts: DataFrame,
    similarity_pairs: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """-> (nodes(id, node_type, label), edges(src, edge_type, dst,
    weight))."""
    nodes = document_nodes(docs, id_col).unionByName(concept_nodes(concepts))
    edges = contains_edges(concepts).unionByName(similarity_edges(similarity_pairs))
    return nodes, edges


def graph_stats(nodes: DataFrame, edges: DataFrame) -> dict:
    """node/edge counts + density (driver-side scalars — tiny)."""
    n = nodes.count()
    e = edges.count()
    density = (2.0 * e / (n * (n - 1))) if n > 1 else 0.0
    return {"total_nodes": n, "total_edges": e, "graph_density": density}
