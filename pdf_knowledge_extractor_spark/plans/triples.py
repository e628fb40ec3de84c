"""Triple materialization — the engine's target output.

The (subj, pred, obj) triple set reproduces the reference's RDF export
vocabulary (exporters/data_analysis.py:1016-1196) plus the knowledge
graph edge set (semantic_analyzer.py:511-572):

edge triples:
  (doc,       'contains',   concept)   weight = concept importance
  (doc1,      'similar_to', doc2)      weight = cosine score
  (entity1,   'related_to', entity2)   weight = mean importance
  (doc,       'in_cluster', cluster)   weight = 1.0
node-property triples (K5 predicates):
  (doc,     'pdf:wordCount',       n)        (doc, 'pdf:characterCount', n)
  (doc,     'pdf:sentimentScore',  s)        (doc, 'pdf:sentimentLabel', l)
  (doc,     'pdf:documentType',    t)
  (concept, 'pdf:conceptType',     t)        (concept, 'pdf:importanceScore', s)
  (concept, 'pdf:frequency',       n)        (concept, 'skos:prefLabel', text)

Output schema: triples(subj, pred, obj, weight, prov) — partitioned by
pred (then bucketable by subj at real scale; plain parquet partitioning
here since Iceberg jars are not in the image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.operators.concepts import concept_id

TRIPLE_COLS = ("subj", "pred", "obj", "weight", "prov")


def _shape(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("subj").cast("string"),
        F.col("pred").cast("string"),
        F.col("obj").cast("string"),
        F.col("weight").cast("double"),
        F.col("prov").cast("string"),
    )


def edge_triples(edges: DataFrame) -> DataFrame:
    return _shape(
        edges.select(
            F.col("src").alias("subj"),
            F.col("edge_type").alias("pred"),
            F.col("dst").alias("obj"),
            F.col("weight"),
            F.lit("graph").alias("prov"),
        )
    )


def document_property_triples(enriched_docs: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """enriched docs with word_count/char_count/sentiment/doc_type ->
    one triple per property (K5 document block,
    exporters/data_analysis.py:1117-1137)."""
    # single scan: build an array of (pred, obj, weight) structs and
    # explode — one stage instead of five unioned scans
    d = enriched_docs
    subj = F.col(id_col).cast("string")
    entries = F.array(
        F.struct(
            F.lit("pdf:wordCount").alias("pred"),
            F.col("word_count").cast("string").alias("obj"),
            F.lit(1.0).alias("weight"),
        ),
        F.struct(
            F.lit("pdf:characterCount").alias("pred"),
            F.col("char_count").cast("string").alias("obj"),
            F.lit(1.0).alias("weight"),
        ),
        F.struct(
            F.lit("pdf:sentimentScore").alias("pred"),
            F.col("sentiment.score").cast("string").alias("obj"),
            F.col("sentiment.score").cast("double").alias("weight"),
        ),
        F.struct(
            F.lit("pdf:sentimentLabel").alias("pred"),
            F.col("sentiment.sentiment").alias("obj"),
            F.lit(1.0).alias("weight"),
        ),
        F.struct(
            F.lit("pdf:documentType").alias("pred"),
            F.col("document_type").alias("obj"),
            F.lit(1.0).alias("weight"),
        ),
    )
    out = d.select(subj.alias("subj"), F.explode(entries).alias("e")).select(
        "subj",
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        F.coalesce(F.col("e.weight"), F.lit(1.0)).alias("weight"),
        F.lit("doc_props").alias("prov"),
    )
    return _shape(out)


def concept_property_triples(concepts: DataFrame) -> DataFrame:
    """K5 concept block (exporters/data_analysis.py:1149-1164)."""
    c = concepts.withColumn("_id", concept_id(F.col("text")))
    entries = F.array(
        F.struct(
            F.lit("skos:prefLabel").alias("pred"),
            F.col("text").alias("obj"),
            F.lit(1.0).alias("weight"),
        ),
        F.struct(
            F.lit("pdf:conceptType").alias("pred"),
            F.col("concept_type").alias("obj"),
            F.lit(1.0).alias("weight"),
        ),
        F.struct(
            F.lit("pdf:importanceScore").alias("pred"),
            F.col("importance").cast("string").alias("obj"),
            F.col("importance").cast("double").alias("weight"),
        ),
        F.struct(
            F.lit("pdf:frequency").alias("pred"),
            F.col("frequency").cast("string").alias("obj"),
            F.col("frequency").cast("double").alias("weight"),
        ),
    )
    out = c.select(
        F.col("_id").alias("subj"), F.explode(entries).alias("e")
    ).select(
        "subj",
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        F.col("e.weight").alias("weight"),
        F.lit("concept_props").alias("prov"),
    )
    return _shape(out)


def cluster_triples(assignments: DataFrame) -> DataFrame:
    return _shape(
        assignments.select(
            F.col("doc_id").cast("string").alias("subj"),
            F.lit("in_cluster").alias("pred"),
            F.concat(F.lit("cluster_"), F.col("cluster_id").cast("string")).alias(
                "obj"
            ),
            F.lit(1.0).alias("weight"),
            F.lit("clustering").alias("prov"),
        )
    )


def write_triples(triples: DataFrame, path: str, n_buckets: int = 32) -> None:
    """Partition by pred; within a pred, repartition on subj so triple
    files co-locate by subject (the parquet analog of
    partitionedBy(pred, bucket(subj)) on Iceberg)."""
    (
        triples.repartition(n_buckets, "pred", "subj")
        .write.mode("overwrite")
        .partitionBy("pred")
        .parquet(path)
    )
