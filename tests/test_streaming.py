"""Streaming == batch equivalence for the windowed event aggregation,
and incremental document enrichment over readStream."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from pdf_knowledge_extractor_spark.streaming.stream_ops import (
    read_event_stream,
    run_stream_to_memory,
    streaming_document_enrichment,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    # FileStreamSource requires directories, not single files
    root = tmp_path_factory.mktemp("streams")
    for name in ("events", "documents"):
        d = root / name
        d.mkdir()
        shutil.copy(f"{SF}/{name}.parquet", d / f"{name}.parquet")
    return root


def test_windowed_counts_stream_equals_batch(spark, stream_dirs):
    stream = read_event_stream(spark, str(stream_dirs / "events"))
    agg = windowed_event_counts(stream, window="1 hour")
    got = run_stream_to_memory(spark, agg, "win_counts")

    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = windowed_event_counts(batch, window="1 hour")

    g = {
        (r["win"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in got.collect()
    }
    e = {
        (r["win"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in expected.collect()
    }
    assert g == e
    assert len(g) > 0


def test_streaming_document_enrichment(spark, stream_dirs):
    enriched = streaming_document_enrichment(spark, str(stream_dirs / "documents"))
    assert enriched.isStreaming
    got = run_stream_to_memory(spark, enriched, "docs_enriched",
                               output_mode="append")
    batch_count = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert got.count() == batch_count
    row = got.filter(F.col("word_count") > 0).first()
    assert row["content_sha256"] is not None
    assert 0.0 <= row["quality"]["overall_score"] <= 1.0
