"""Export renderers: N-Triples shape, JSON-LD structure (@id + props,
non-empty @graph analog — mirrors the reference exporter tests'
structural assertions), CSV relation round-trip."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from pdf_knowledge_extractor_spark.plans.exports import (
    export_csv_relations,
    jsonld_graph,
    rdf_ntriples_lines,
    statistics_relation,
)


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        [
            ("doc1", "contains", "concept_spark", 0.8, "graph"),
            ("doc1", "pdf:wordCount", "42", 1.0, "doc_props"),
            ("doc1", "similar_to", "doc2", 0.91, "graph"),
            ("concept_spark", "skos:prefLabel", 'say "hi"', 1.0, "concept_props"),
        ],
        "subj string, pred string, obj string, weight double, prov string",
    )


def test_ntriples_shape(spark, triples):
    lines = [r["ntriple"] for r in rdf_ntriples_lines(triples).collect()]
    assert len(lines) == 4
    for ln in lines:
        assert ln.startswith("<http://") and ln.endswith(" .")
    node_refs = [ln for ln in lines if "similar_to" in ln]
    assert node_refs and node_refs[0].count("<") == 3  # subj, pred, obj URIs
    literals = [ln for ln in lines if "wordCount" in ln]
    assert '"42"' in literals[0]
    quoted = [ln for ln in lines if "prefLabel" in ln]
    assert '\\"hi\\"' in quoted[0]


def test_jsonld_structure(spark, triples):
    rows = {r["subj"]: json.loads(r["jsonld"]) for r in jsonld_graph(triples).collect()}
    assert rows, "@graph must be non-empty"
    d1 = rows["doc1"]
    assert d1["@id"] == "doc1"
    assert d1["props"]["contains"] == ["concept_spark"]
    assert d1["props"]["pdf:wordCount"] == ["42"]


def test_jsonld_typed_structure(spark):
    """Mirrors the reference exporter fixture test
    (exporters/tests/test_exporters.py:214-239): @context present,
    @graph a non-empty list — plus the typed-object shape of
    _create_document_jsonld / _create_concept_jsonld."""
    from pdf_knowledge_extractor_spark.plans.exports import jsonld_structure

    docs = spark.createDataFrame(
        [(1, 10, 57, ("positive", 0.8, 2, 0), "technical")],
        "doc_id long, word_count long, char_count long, "
        "sentiment struct<sentiment:string,score:double,"
        "positive_indicators:long,negative_indicators:long>, "
        "document_type string",
    )
    concepts = spark.createDataFrame(
        [("spark sql", "phrase", 7, 0.6, [1, 2], ["Spark SQL is fast"])],
        "text string, concept_type string, frequency long, "
        "importance double, document_ids array<long>, "
        "context_sentences array<string>",
    )
    sims = spark.createDataFrame(
        [(1, 2, 0.91, "cosine")],
        "doc1_id long, doc2_id long, similarity_score double, "
        "similarity_type string",
    )
    data = jsonld_structure(
        {"documents": docs, "concepts": concepts, "similarities": sims}
    )
    assert "@context" in data
    assert data["@context"]["skos"].startswith("http://www.w3.org/2004")
    assert "@graph" in data and isinstance(data["@graph"], list)
    assert len(data["@graph"]) == 3
    by_type = {tuple(o["@type"]) if isinstance(o["@type"], list)
               else (o["@type"],): o for o in data["@graph"]}
    doc = by_type[("DigitalDocument", "pdf:AnalyzedDocument")]
    assert doc["wordCount"] == 10 and doc["pdf:sentimentLabel"] == "positive"
    con = by_type[("DefinedTerm", "skos:Concept")]
    assert con["skos:prefLabel"] == "spark sql"
    assert con["description"] == "Spark SQL is fast"
    assert con["pdf:appearsIn"] == [
        {"@id": "https://pdfextractor.ai/kb/document/1"},
        {"@id": "https://pdfextractor.ai/kb/document/2"},
    ]
    rel = by_type[("pdf:DocumentSimilarity",)]
    assert rel["pdf:similarityScore"] == 0.91


def test_graph_debug_exports(spark, tmp_path):
    """K4 GraphML / node-link JSON / GEXF sinks parse back
    (export_knowledge_graph, semantic_analyzer.py:593-604)."""
    import xml.etree.ElementTree as ET

    from pdf_knowledge_extractor_spark.plans.exports import export_graph

    nodes = spark.createDataFrame(
        [
            ("1", "document", "1", {"filename": "a.pdf", "size": "57"}),
            ("concept_spark", "concept", "spark", {"frequency": "7"}),
        ],
        "id string, node_type string, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [("1", "contains", "concept_spark", 0.6)],
        "src string, edge_type string, dst string, weight double",
    )
    gml = str(tmp_path / "g.graphml")
    export_graph(nodes, edges, gml, "graphml")
    root = ET.parse(gml).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    xml_nodes = root.findall(f".//{ns}node")
    assert {n.get("id") for n in xml_nodes} == {"1", "concept_spark"}
    assert len(root.findall(f".//{ns}edge")) == 1

    nlj = str(tmp_path / "g.json")
    export_graph(nodes, edges, nlj, "json")
    data = json.loads(open(nlj).read())
    assert {n["id"] for n in data["nodes"]} == {"1", "concept_spark"}
    assert data["links"][0]["source"] == "1"
    assert data["nodes"][0]["filename"] == "a.pdf"

    gexf = str(tmp_path / "g.gexf")
    export_graph(nodes, edges, gexf, "gexf")
    assert ET.parse(gexf).getroot().tag.endswith("gexf")

    with pytest.raises(ValueError):
        export_graph(nodes, edges, str(tmp_path / "x"), "dot")
    with pytest.raises(ValueError):
        export_graph(nodes, edges, str(tmp_path / "x"), "graphml", max_nodes=1)


def test_csv_relations_roundtrip(spark, triples, tmp_path):
    docs = spark.createDataFrame(
        [("doc1", ["a", "b"], {"k": 1.0})],
        "doc_id string, tags array<string>, scores map<string,double>",
    )
    rels = {"triples": triples, "documents": docs}
    out = str(tmp_path / "csv")
    export_csv_relations(rels, out)
    back = spark.read.option("header", True).csv(f"{out}/triples")
    assert back.count() == 4
    docs_back = spark.read.option("header", True).csv(f"{out}/documents")
    row = docs_back.first()
    assert json.loads(row["tags"]) == ["a", "b"]
    stats = {r["relation"]: r["rows"] for r in statistics_relation(rels).collect()}
    assert stats == {"triples": 4, "documents": 1}


def test_json_sink_roundtrip(spark, tmp_path):
    """K1 (JSON result sink): triples written with the std JSON writer
    read back value-identical (schema + rows)."""
    import pyspark.sql.functions as F

    triples = spark.createDataFrame(
        [
            ("d1", "contains", "concept_spark", 0.9, "graph"),
            ("d1", "pdf:wordCount", "42", 1.0, "doc_props"),
            ("concept_spark", "skos:prefLabel", 'say "hi"\nline2', 1.0,
             "concept_props"),
        ],
        "subj string, pred string, obj string, weight double, prov string",
    )
    out = str(tmp_path / "triples_json")
    triples.write.mode("overwrite").json(out)
    back = spark.read.json(out).select(
        "subj", "pred", "obj", F.col("weight").cast("double"), "prov"
    )
    assert back.count() == 3
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, triples.collect())
    )
