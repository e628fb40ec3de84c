"""Structured Streaming pipelines over the events table schema.

Batch-equivalent semantics are tested against the batch operators:
windowed aggregation (A7 distribution analog over event time) and an
incremental document-ingest stream that runs the per-doc enrichment
projections (the streaming analog of EP1's scan+stats pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_event_stream(spark: SparkSession, path_glob: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path_glob)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling/sliding window counts + value sums with a
    late-data watermark. Works on both static and streaming frames
    (streaming adds state cleanup via the watermark)."""
    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(w.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a streaming frame to completion against currently
    available files (test/dev harness) and return the materialized
    result as a static DataFrame."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_document_enrichment(spark: SparkSession,
                                  path_glob: str) -> DataFrame:
    """Incremental document ingest: per-doc stats/quality projections
    over readStream — the streaming analog of the batch enrich stage
    (all narrow column expressions; no state)."""
    from pdf_knowledge_extractor_spark.plans.pipeline import enrich_documents

    docs = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )
    return enrich_documents(docs, "doc_id", "text")
