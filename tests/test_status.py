"""Status / quarantine table: merge semantics, failure escalation,
resume filtering."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_knowledge_extractor_spark.sources.status import (
    COMPLETED,
    FAILED,
    PENDING,
    QUARANTINED,
    backoff_seconds,
    empty_status,
    merge_status,
    processable,
)


def test_merge_and_quarantine_escalation(spark):
    status = empty_status(spark)
    fail_update = spark.createDataFrame(
        [("d1", FAILED, "boom"), ("d2", COMPLETED, None)],
        "doc_id string, status string, last_error string",
    )
    # three consecutive failures -> quarantine
    for i in range(3):
        status = merge_status(status, fail_update).persist()
    rows = {r["doc_id"]: r for r in status.collect()}
    assert rows["d1"]["status"] == QUARANTINED
    assert rows["d1"]["failure_count"] == 3
    assert rows["d1"]["quarantined_until"] is not None
    assert rows["d2"]["status"] == COMPLETED
    assert rows["d2"]["failure_count"] == 0


def test_processable_filters_completed_and_quarantined(spark):
    import datetime as dt

    status = spark.createDataFrame(
        [
            ("a", COMPLETED, 0, None, None),
            ("b", QUARANTINED, 3, "x", dt.datetime(2099, 1, 1)),
            ("c", QUARANTINED, 3, "x", dt.datetime(2000, 1, 1)),  # released
            ("d", FAILED, 1, "x", None),
        ],
        "doc_id string, status string, failure_count int, last_error string,"
        " quarantined_until timestamp",
    ).withColumn("updated_at", F.current_timestamp())
    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "doc_id string"
    )
    got = {r["doc_id"] for r in processable(status, docs).collect()}
    assert got == {"c", "d", "e"}


def test_backoff_schedule(spark):
    df = spark.createDataFrame([(0,), (1,), (3,), (10,)], "f int")
    rows = {
        r["f"]: r["b"]
        for r in df.select("f", backoff_seconds(F.col("f")).alias("b")).collect()
    }
    assert rows[0] == 1.0
    assert rows[1] == 2.0
    assert rows[3] == 8.0
    assert rows[10] == 30.0  # capped
