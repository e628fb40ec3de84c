"""End-to-end KG construction pipeline (EP3 analog,
semantic_analyzer.analyze_document_collection at
semantic_analyzer.py:134-191, re-planned as one Spark lineage DAG):

docs -> enrich (stats/quality/sentiment/type)
     -> mentions (keywords + phrases [+ code entities])
     -> tfidf (long form)
     -> {concepts (salted agg), similarity pairs (exact or LSH)}
     -> related docs, [clusters]
     -> nodes/edges -> triples

Shuffle budget (what actually moves at 100 TB): one shuffle into
groupBy(doc_id, term) for TF (map-side combined), one into
groupBy(term) for DF, one for the similarity join on hash(term) (or
the LSH bucket join), one for the salted concept agg, one for the
related-docs posting join, and the final repartition for the triple
write. Every doc-level enrichment is a narrow map over the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.functions.doctype import doc_type
from pdf_knowledge_extractor_spark.functions.quality import quality_struct
from pdf_knowledge_extractor_spark.functions.sentiment import sentiment_struct
from pdf_knowledge_extractor_spark.functions.text import (
    char_count,
    sha256,
    word_count,
)
from pdf_knowledge_extractor_spark.operators.concepts import (
    aggregate_concepts,
    canonical_merge,
)
from pdf_knowledge_extractor_spark.operators.graph import build_graph
from pdf_knowledge_extractor_spark.operators.mentions import (
    all_mentions,
    keyword_mentions,
)
from pdf_knowledge_extractor_spark.operators.related import (
    entity_relationships,
    related_documents,
)
from pdf_knowledge_extractor_spark.operators.similarity import (
    exact_cosine_pairs,
    lsh_cosine_pairs,
    prefix_cosine_pairs,
    with_similarity_metadata,
)
from pdf_knowledge_extractor_spark.operators.tfidf import (
    tfidf_longform,
    to_ml_vectors,
)
from pdf_knowledge_extractor_spark.plans import triples as T3


@dataclass
class PipelineConfig:
    """Defaults mirror the reference's (semantic_analyzer.py:95-101,
    exporters/base.py:32-34)."""

    similarity_threshold: float = 0.7
    min_concept_frequency: int = 2
    max_concepts: int = 100
    num_similar: int = 5
    min_shared_keywords: int = 3
    related_top_k: int = 10
    per_doc_keywords: int = 20
    # similarity-join physical strategy:
    #  "exact"  — full term self-join (small corpora / oracle parity)
    #  "prefix" — prefix-filtered exact join (default scale path,
    #             Bayardo WWW'07: exact results, Σ prefix_df² cost)
    #  "lsh"    — BucketedRandomProjection blocking + exact rescore
    #             (approximate recall, tunable)
    similarity_strategy: str = "prefix"
    lsh_hash_tables: int = 4
    lsh_dims: int = 1 << 12         # hashed term space for blocking only
                                    # (rescoring is exact; raise to 2^16+
                                    # for vocabularies >> 100k terms)
    with_clusters: bool = False     # KMeans adds driver-side loop; opt-in
    with_entities: bool = True      # code-entity detectors if lang col
    canonicalize: bool = True       # alias canonicalization before cuts
    n_salts: int = 16
    extra: dict = field(default_factory=dict)


def enrich_documents(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     page_count_col: str | None = None) -> DataFrame:
    """Narrow per-doc projections: counts, quality, sentiment, type,
    sha256 invariant."""
    text = F.col(text_col)
    pages = (
        F.col(page_count_col)
        if page_count_col
        else F.greatest(
            (F.length(text) / 2500.0).cast("int") + 1, F.lit(1)
        )
    )
    return docs.select(
        "*",
        sha256(text).alias("content_sha256"),
        word_count(text).alias("word_count"),
        char_count(text).alias("char_count"),
        quality_struct(text, pages).alias("quality"),
        sentiment_struct(text).alias("sentiment"),
        doc_type(text).alias("document_type"),
    )


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
) -> dict[str, DataFrame]:
    """Run the full KG-construction DAG; returns every relation."""
    cfg = cfg or PipelineConfig()

    enriched = enrich_documents(docs, id_col, text_col).persist()
    mentions = all_mentions(
        enriched, id_col=id_col, text_col=text_col,
        lang_col=lang_col if cfg.with_entities else None,
    )
    kw_mentions = keyword_mentions(enriched, id_col, text_col)

    tfidf = tfidf_longform(
        kw_mentions.select("doc_id", F.col("text")), normalize=True
    ).persist()

    if cfg.canonicalize:
        raw_concepts = aggregate_concepts(
            mentions, min_frequency=1, max_concepts=None, n_salts=cfg.n_salts
        )
        concepts = canonical_merge(
            raw_concepts,
            min_frequency=cfg.min_concept_frequency,
            max_concepts=cfg.max_concepts,
        ).persist()
    else:
        concepts = aggregate_concepts(
            mentions,
            min_frequency=cfg.min_concept_frequency,
            max_concepts=cfg.max_concepts,
            n_salts=cfg.n_salts,
        ).persist()

    if cfg.similarity_strategy == "lsh":
        vectors = to_ml_vectors(tfidf, vocab_size=cfg.lsh_dims).persist()
        pairs = lsh_cosine_pairs(
            vectors,
            threshold=cfg.similarity_threshold,
            num_hash_tables=cfg.lsh_hash_tables,
            tfidf=tfidf,
        )
    elif cfg.similarity_strategy == "prefix":
        pairs = prefix_cosine_pairs(tfidf, threshold=cfg.similarity_threshold)
    else:
        pairs = exact_cosine_pairs(tfidf, threshold=cfg.similarity_threshold)
    similarities = with_similarity_metadata(pairs).persist()

    # per-doc top keywords straight off the persisted tfidf long form
    # (its tf column IS the per-doc keyword count — no recompute)
    kw_window = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("term")
    )
    doc_kw = (
        tfidf.withColumn("_r", F.row_number().over(kw_window))
        .filter(F.col("_r") <= cfg.per_doc_keywords)
        .select("doc_id", F.col("term").alias("text"))
    )
    related = related_documents(
        doc_kw,
        min_shared=cfg.min_shared_keywords,
        top_k=cfg.related_top_k,
    )

    nodes, edges = build_graph(enriched, concepts, similarities, id_col=id_col)
    rel = entity_relationships(concepts)
    rel_edges = rel.select(
        F.col("entity1").alias("src"),
        F.col("pred").alias("edge_type"),
        F.col("entity2").alias("dst"),
        F.col("strength").alias("weight"),
    )
    edges = edges.unionByName(rel_edges)

    result: dict[str, DataFrame] = {
        "documents": enriched,
        "mentions": mentions,
        "tfidf": tfidf,
        "concepts": concepts,
        "similarities": similarities,
        "related": related,
        "nodes": nodes,
        "edges": edges,
    }

    triple_parts = [
        T3.edge_triples(edges),
        T3.document_property_triples(enriched, id_col=id_col),
        T3.concept_property_triples(concepts),
    ]

    if cfg.with_clusters:
        from pdf_knowledge_extractor_spark.operators.clustering import (
            cluster_documents,
            cluster_summaries,
        )

        vectors = to_ml_vectors(tfidf)
        assignments, k, silhouette = cluster_documents(vectors)
        result["clusters"] = cluster_summaries(assignments, tfidf)
        result["cluster_assignments"] = assignments
        triple_parts.append(T3.cluster_triples(assignments))

    triples = triple_parts[0]
    for p in triple_parts[1:]:
        triples = triples.unionByName(p)
    result["triples"] = triples
    return result
