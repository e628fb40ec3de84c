"""Document status / quarantine table — the dead-letter analog of the
reference's DocumentContext state machine.

Semantics reproduced (claude_integration.py): ProcessingStatus enum
(:29-36 — pending/processing/completed/failed/quarantined), retry
counting with exponential backoff (calculate_exponential_backoff
:469-495), quarantine after repeated failures with a 2^failures-hour
release schedule (should_quarantine_document :572-609,
quarantine_document :611-629).

Spark-native shape: one status row per doc_id, updated by idempotent
merge (anti-join + union — the parquet emulation of Iceberg
MERGE INTO), all release-time math as column expressions. Task-level
transient failures are Spark's own `spark.task.maxFailures`; this
table tracks *semantic* failures (bad documents) so they route out of
the hot path instead of being retried forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_SCHEMA = (
    "doc_id string, status string, failure_count int, "
    "last_error string, quarantined_until timestamp, updated_at timestamp"
)

PENDING = "pending"
COMPLETED = "completed"
FAILED = "failed"
QUARANTINED = "quarantined"

QUARANTINE_AFTER_FAILURES = 3


def empty_status(spark) -> DataFrame:
    return spark.createDataFrame([], STATUS_SCHEMA)


def merge_status(current: DataFrame, updates: DataFrame) -> DataFrame:
    """Upsert semantics (MERGE INTO emulation): updates win on key
    collision; failure counts accumulate; docs crossing the failure
    threshold move to quarantined with release = now + 2^failures
    hours (reference's escalating release schedule)."""
    cur = current.select(
        "doc_id",
        F.col("status").alias("_old_status"),
        F.col("failure_count").alias("_old_failures"),
        F.col("last_error").alias("_old_error"),
        F.col("quarantined_until").alias("_old_quarantine"),
        F.col("updated_at").alias("_old_updated"),
    )
    upd = updates.select(
        "doc_id",
        F.col("status").alias("_new_status"),
        F.col("last_error").alias("_new_error"),
    )
    joined = cur.join(upd, "doc_id", "full")
    failure_count = F.when(
        F.col("_new_status") == FAILED,
        F.coalesce(F.col("_old_failures"), F.lit(0)) + 1,
    ).otherwise(F.coalesce(F.col("_old_failures"), F.lit(0)))
    status = F.when(
        (F.col("_new_status") == FAILED)
        & (failure_count >= QUARANTINE_AFTER_FAILURES),
        QUARANTINED,
    ).otherwise(
        F.coalesce(F.col("_new_status"), F.col("_old_status"))
    )
    quarantined_until = F.when(
        status == QUARANTINED,
        F.timestamp_seconds(
            F.unix_timestamp(F.current_timestamp())
            + F.pow(F.lit(2.0), failure_count.cast("double")).cast("long")
            * 3600
        ),
    ).otherwise(F.col("_old_quarantine"))
    return joined.select(
        "doc_id",
        status.alias("status"),
        failure_count.cast("int").alias("failure_count"),
        F.coalesce(F.col("_new_error"), F.col("_old_error")).alias("last_error"),
        quarantined_until.alias("quarantined_until"),
        F.current_timestamp().alias("updated_at"),
    )


def processable(status: DataFrame, docs: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """Resume filter (F2/U3): docs not completed and not currently
    quarantined. left_anti against the blocked set."""
    blocked = status.filter(
        (F.col("status") == COMPLETED)
        | (
            (F.col("status") == QUARANTINED)
            & (F.col("quarantined_until") > F.current_timestamp())
        )
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(blocked, id_col, "left_anti")


def backoff_seconds(failure_count, base: float = 1.0, cap: float = 30.0):
    """Exponential backoff column: min(base * 2^failures, cap)
    (claude_integration.py:469-495 without the jitter — deterministic
    for tests; Spark task scheduling provides natural jitter)."""
    return F.least(
        F.lit(base) * F.pow(F.lit(2.0), failure_count.cast("double")),
        F.lit(cap),
    )
