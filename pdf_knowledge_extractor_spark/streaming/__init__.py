"""Structured Streaming operators.

The reference is batch-with-resume (SURVEY.md §2.10) — no watermarks
or event-time semantics exist there. This module is the engine's
superset: the same aggregations exposed over readStream for
incremental ingestion of the events/documents tables at scale.
"""
