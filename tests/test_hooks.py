"""Custom hook registry (§2.9, config.yaml.example:176-181 analog):
a registered preprocessor rewrites the text column, and a registered
mention detector's mentions flow into concepts and triples."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_knowledge_extractor_spark import hooks
from pdf_knowledge_extractor_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)


@hooks.register_preprocessor("strip_banners")
def _strip_banners(col):
    # drop license-banner lines, a typical custom preprocessing step
    return F.regexp_replace(col, r"(?m)^// SPDX-License.*$", "")


@hooks.register_mention_detector("todo_tags")
def _todo_tags(docs, id_col="doc_id", text_col="text"):
    toks = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?:TODO|FIXME)\(([a-z]+)\)"), 1
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("text")
    ).select(
        "doc_id",
        "text",
        F.lit("todo_tag").alias("concept_type"),
        F.lit(0.9).alias("importance"),
    )


def test_unknown_hook_raises(spark, small_corpus):
    import pytest

    cfg = PipelineConfig(extra={"feature_extractors": ["nope"]})
    with pytest.raises(KeyError):
        run_pipeline(spark, small_corpus, cfg,
                     id_col="doc_id", text_col="content")


def test_hooks_flow_into_concepts_and_triples(spark):
    docs = spark.createDataFrame(
        [
            (1, "// SPDX-License apache two\nalpha TODO(alice) beta gamma "
                "delta TODO(alice) epsilon"),
            (2, "alpha beta FIXME(alice) gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta TODO(bob) epsilon"),
        ],
        "doc_id long, text string",
    )
    cfg = PipelineConfig(
        similarity_strategy="exact",
        extra={
            "preprocessing_pipeline": ["strip_banners"],
            "feature_extractors": ["todo_tags"],
        },
    )
    res = run_pipeline(spark, docs, cfg)
    # preprocessor ran: banner words never become mentions
    ment_texts = {
        r["text"] for r in res["mentions"].select("text").distinct().collect()
    }
    assert "spdx" not in ment_texts and "license" not in ment_texts
    # detector mentions aggregated into concepts with their own type
    cons = {
        (r["text"], r["concept_type"], r["frequency"])
        for r in res["concepts"]
        .select("text", "concept_type", "frequency")
        .collect()
    }
    assert ("alice", "todo_tag", 3) in cons
    # and flow through to contains triples
    contains = {
        (r["subj"], r["obj"])
        for r in res["triples"].filter(F.col("pred") == "contains").collect()
    }
    assert ("1", "concept_alice") in contains and ("2", "concept_alice") in contains
