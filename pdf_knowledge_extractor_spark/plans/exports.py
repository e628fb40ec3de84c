"""Export sinks (SURVEY.md §2.1 K4-K7): thin rendering projections
over the engine's relations.

The reference ships ~20 exporter classes (exporters/*.py, ~6000 LoC of
string templating). Engine-side, every one of them is a projection or
`to_json` aggregation over the six core relations — so the engine
exposes the relations plus the three renderers that define the triple
vocabulary:

- RDF N-Triples lines (K5 vocabulary, exporters/data_analysis.py:
  1016-1196): one line per (subj, pred, obj) with URI minting.
- JSON-LD @graph objects (K6, :791-1013): per-subject grouped JSON.
- Multi-CSV relations (K7, :36-342): documents/concepts/
  relationships/clusters/mapping/statistics — direct df.write.csv.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.functions.text import uri_encode

BASE_URI = "http://pdf-extractor.example.org/"


def rdf_ntriples_lines(triples: DataFrame) -> DataFrame:
    """(subj,pred,obj) -> one N-Triples line per row. Predicates keep
    their prefix form (pdf:/skos:/dct: vocabularies per K5); subjects
    and node objects are URI-minted with the reference's encoding rule
    (non-word -> _, collapsed, capped 100)."""
    subj_uri = F.concat(F.lit("<" + BASE_URI), uri_encode(F.col("subj")), F.lit(">"))
    is_node_ref = F.col("pred").isin("contains", "similar_to", "related_to",
                                     "in_cluster")
    obj_part = F.when(
        is_node_ref,
        F.concat(F.lit("<" + BASE_URI), uri_encode(F.col("obj")), F.lit(">")),
    ).otherwise(
        F.concat(F.lit('"'), F.regexp_replace(F.col("obj"), '"', '\\\\"'),
                 F.lit('"'))
    )
    return triples.select(
        F.concat_ws(
            " ",
            subj_uri,
            F.concat(F.lit("<" + BASE_URI + "vocab/"),
                     uri_encode(F.col("pred")), F.lit(">")),
            obj_part,
            F.lit("."),
        ).alias("ntriple")
    )


def jsonld_graph(triples: DataFrame) -> DataFrame:
    """Per-subject JSON-LD object: {"@id": subj, pred: [obj...]}
    rendered with to_json over grouped predicate maps (K6 @graph)."""
    grouped = (
        triples.groupBy("subj", "pred")
        .agg(F.array_sort(F.collect_list("obj")).alias("objs"))
        .groupBy("subj")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("pred", "objs")))
            ).alias("props")
        )
    )
    return grouped.select(
        "subj",
        F.to_json(
            F.struct(F.col("subj").alias("@id"), F.col("props"))
        ).alias("jsonld"),
    )


def export_csv_relations(relations: dict[str, DataFrame], out_dir: str) -> None:
    """K7 multi-CSV sink: one CSV directory per relation (documents,
    concepts, similarities, related, clusters, triples). Array/map/
    struct columns are JSON-encoded (CSV cannot nest)."""
    import pyspark.sql.types as T

    for name, df in relations.items():
        flat = df
        for field in df.schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
                flat = flat.withColumn(field.name, F.to_json(F.col(field.name)))
        flat.write.mode("overwrite").option("header", True).csv(
            f"{out_dir}/{name}"
        )


def statistics_relation(relations: dict[str, DataFrame]) -> DataFrame:
    """K7 statistics.csv analog: one row per relation with its row
    count (computed distributed, unioned on the driver)."""
    spark = next(iter(relations.values())).sparkSession
    rows = [(name, df.count()) for name, df in relations.items()]
    return spark.createDataFrame(rows, "relation string, rows long")
