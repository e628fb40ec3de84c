"""Stateful streaming (applyInPandasWithState): state must carry
across micro-batches and agree with the batch computation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pdf_knowledge_extractor_spark.streaming.stateful import (
    running_user_counts,
    session_aggregator,
)
from pdf_knowledge_extractor_spark.streaming.stream_ops import (
    EVENTS_SCHEMA,
    run_stream_to_memory,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """Events split into 2 files -> 2 micro-batches (state must carry)."""
    d = tmp_path_factory.mktemp("ev_split")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # split by TIME so micro-batches arrive in event-time order
    # (gap-state sessionization assumes ordered arrival; out-of-order
    # handling needs a watermark+sort stage upstream)
    median = ev.select(
        F.percentile_approx("ts", 0.5).cast("timestamp").alias("m")
    ).first()["m"]
    ev.filter(F.col("ts") <= median).coalesce(1).write.parquet(str(d / "a"))
    ev.filter(F.col("ts") > median).coalesce(1).write.parquet(str(d / "b"))
    # flatten into one dir of files
    import glob
    import shutil

    out = tmp_path_factory.mktemp("ev_files")
    import os
    import time

    now = time.time()
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "*.parquet")))):
        dst = out / f"part{i}.parquet"
        shutil.copy(f, dst)
        # FileStreamSource orders micro-batches by modification time —
        # pin mtimes so the time-ordered file is processed first
        os.utime(dst, (now + i * 10, now + i * 10))
    return str(out)


def _stream(spark, path):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_running_counts_carry_state_across_batches(spark, split_events_dir):
    out = run_stream_to_memory(
        spark,
        running_user_counts(_stream(spark, split_events_dir)),
        "run_counts",
        output_mode="update",
    )
    # latest update per user = final running total
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("user_id", "n_events", "sum_value")
    )
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    g = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
         for r in final.collect()}
    e = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
         for r in batch.collect()}
    assert g == e


def test_session_aggregator_matches_batch_sessionization(
    spark, split_events_dir
):
    out = run_stream_to_memory(
        spark,
        session_aggregator(_stream(spark, split_events_dir), 1800),
        "sessions_closed",
        output_mode="append",
    )
    closed = out.groupBy("user_id").agg(F.count("*").alias("closed"))
    # batch: total sessions per user (lag-gap method); streaming emits
    # closed sessions only — the one open session per active user stays
    # in state, so closed == total - 1 for every user with >= 1 session
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    total = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("total"))
    )
    g = {r["user_id"]: r["closed"] for r in closed.collect()}
    e = {r["user_id"]: r["total"] for r in total.collect()}
    for uid, tot in e.items():
        assert g.get(uid, 0) == tot - 1, uid
