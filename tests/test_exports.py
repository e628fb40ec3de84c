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
