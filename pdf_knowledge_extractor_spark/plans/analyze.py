"""EP1/EP2-shape entry points (SURVEY.md §3).

- analyze_corpus: the `--mode analyze` pass (extractor.analyze_directory,
  extractor.py:254-297): per-doc metadata + limit predicates + 3-way
  routing + collection summary. One narrow stage plus one global agg.
- analyze_incremental: the reference's incremental admission
  (semantic_analyzer.analyze_document_collection_incremental,
  :193-237): detect new docs via anti-join on the previous snapshot's
  ids; the reference then RECOMPUTES the full collection (its :232-234
  admission) — we do the same, returning both the new-doc set and the
  recomputed pipeline relations. True delta-computation is the
  checkpointed pipeline's job (fingerprint change -> stage re-run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.functions.quality import is_valid_text
from pdf_knowledge_extractor_spark.functions.text import (
    char_count,
    estimate_tokens,
    sha256,
    word_count,
)

DEFAULT_MAX_CHARS = 25_000_000  # 10 MB * ~2500 chars/page analog
DEFAULT_MAX_PAGES = 100
CHARS_PER_PAGE = 2500


def analyze_corpus(
    docs: DataFrame,
    text_col: str = "text",
    max_pages: int = DEFAULT_MAX_PAGES,
) -> dict[str, DataFrame]:
    """-> {analysis, processable, special_handling, errors, summary}.

    Routing mirrors extractor.analyze_file (:163-227): exceeding the
    page limit routes to special handling; invalid text routes to
    errors; the rest is processable.
    """
    text = F.col(text_col)
    page_count = (F.floor(F.length(text) / CHARS_PER_PAGE) + 1).cast("int")
    analysis = docs.select(
        "*",
        sha256(text).alias("content_sha256"),
        char_count(text).alias("char_count"),
        word_count(text).cast("long").alias("word_count"),
        estimate_tokens(text).alias("estimated_tokens"),
        page_count.alias("page_count"),
        (page_count > max_pages).alias("exceeds_page_limit"),
        is_valid_text(text).alias("text_valid"),
    ).withColumn(
        "route",
        F.when(~F.col("text_valid"), "errors")
        .when(F.col("exceeds_page_limit"), "special_handling")
        .otherwise("processable"),
    )
    summary = analysis.agg(
        F.count("*").alias("total_analyzed"),
        F.sum("char_count").alias("total_chars"),
        F.sum("page_count").alias("total_pages"),
        F.sum(F.when(F.col("route") == "processable", 1).otherwise(0)).alias(
            "n_processable"
        ),
        F.sum(
            F.when(F.col("route") == "special_handling", 1).otherwise(0)
        ).alias("n_special"),
        F.sum(F.when(F.col("route") == "errors", 1).otherwise(0)).alias(
            "n_errors"
        ),
    )
    return {
        "analysis": analysis,
        "processable": analysis.filter(F.col("route") == "processable"),
        "special_handling": analysis.filter(
            F.col("route") == "special_handling"
        ),
        "errors": analysis.filter(F.col("route") == "errors"),
        "summary": summary,
    }


def analyze_incremental(
    spark: SparkSession,
    docs: DataFrame,
    previous_doc_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    cfg=None,
) -> dict[str, DataFrame]:
    """Detect new docs (anti-join) and recompute the collection
    (reference recompute-admission). Returns pipeline relations plus
    ``new_documents``."""
    from pdf_knowledge_extractor_spark.plans.pipeline import run_pipeline

    new_docs = docs.join(
        previous_doc_ids.select(id_col).distinct(), id_col, "left_anti"
    )
    res = run_pipeline(
        spark, docs, cfg, id_col=id_col, text_col=text_col,
        lang_col=lang_col,
    )
    res["new_documents"] = new_docs
    return res
