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
    """Document nodes with the reference's property map
    (semantic_analyzer.py:516-528: filename, file size, page count) —
    keys present only when the source columns exist."""
    entries = []
    if "source" in docs.columns:
        entries.append(
            F.struct(F.lit("filename").alias("key"),
                     F.col("source").cast("string").alias("value"))
        )
    size_col = next(
        (c for c in ("char_count", "n_chars") if c in docs.columns), None
    )
    if size_col is not None:
        # reference property keys (semantic_analyzer.py:524-526):
        # size_mb (MB, from file metadata — here derived from content
        # bytes) and page_count (the 2500-chars/page estimator)
        entries.append(
            F.struct(
                F.lit("size_mb").alias("key"),
                F.round(F.col(size_col) / 1048576.0, 6)
                .cast("string").alias("value"),
            )
        )
        entries.append(
            F.struct(
                F.lit("page_count").alias("key"),
                (F.floor(F.col(size_col) / 2500.0) + 1)
                .cast("long").cast("string").alias("value"),
            )
        )
    props = (
        F.map_from_entries(F.array(*entries))
        if entries
        else F.map_from_entries(
            F.array().cast("array<struct<key:string,value:string>>")
        )
    )
    return docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.lit("document").alias("node_type"),
        F.col(id_col).cast("string").alias("label"),
        props.alias("props"),
    )


def concept_nodes(concepts: DataFrame) -> DataFrame:
    """Concept nodes with type/frequency/importance props
    (semantic_analyzer.py:531-543)."""
    return concepts.select(
        concept_id(F.col("text")).alias("id"),
        F.lit("concept").alias("node_type"),
        F.col("text").alias("label"),
        F.map_from_entries(
            F.array(
                F.struct(F.lit("concept_type").alias("key"),
                         F.col("concept_type").cast("string").alias("value")),
                F.struct(F.lit("frequency").alias("key"),
                         F.col("frequency").cast("string").alias("value")),
                F.struct(F.lit("importance").alias("key"),
                         F.col("importance").cast("string").alias("value")),
            )
        ).alias("props"),
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
