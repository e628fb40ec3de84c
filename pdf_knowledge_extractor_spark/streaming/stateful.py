"""Custom stateful streaming operators via applyInPandasWithState.

The reference's incremental mode re-computes from saved state files
(semantic_analyzer.py:193-237); the streaming-native equivalent keeps
per-key state inside the engine. Two operators:

- running_user_counts: per-user running event count + value sum —
  the streaming analog of the reference's BatchProgress counters
  (claude_integration.py:106-234), state carried across micro-batches.
- session_aggregator: gap-based sessionization with explicit state
  (open-session start/end/count), emitting one row per closed session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Streaming (user_id) -> running (n_events, sum_value); emits the
    updated running totals every micro-batch the key appears in."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_aggregator(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization with explicit per-user state: emits one
    row per CLOSED session (a new event more than ``gap_seconds`` after
    the previous one closes the open session). The final open session
    stays in state (would be flushed by a timeout in production)."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sess_start, sess_end, sess_n = (
            state.get if state.exists else (None, None, 0)
        )
        closed = []
        # gather the whole micro-batch for this key before sorting —
        # the group may arrive as multiple unsorted Arrow chunks
        all_ts = []
        for pdf in pdfs:
            all_ts.extend(pdf["ts"])
        for ts in sorted(all_ts):
            epoch = ts.timestamp()
            if sess_start is None:
                sess_start, sess_end, sess_n = epoch, epoch, 1
            elif epoch - sess_end > gap_seconds:
                closed.append((key[0], sess_start, sess_end, sess_n))
                sess_start, sess_end, sess_n = epoch, epoch, 1
            else:
                sess_end = epoch
                sess_n += 1
        state.update((sess_start, sess_end, sess_n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, session_start double, session_end double, "
            "n_events long"
        ),
        stateStructType="start double, end double, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
