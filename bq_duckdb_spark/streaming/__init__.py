"""Structured Streaming operators.

The reference has no streaming subsystem (SURVEY.md §2.11) — this module
is the beyond-reference scale path for the ``events`` stream shape:
file-source streams, watermarked event-time windows, session windows,
and a custom stateful operator via ``applyInPandasWithState``.
"""

from bq_duckdb_spark.streaming.streams import (
    click_attribution,
    read_document_stream,
    read_event_stream,
    run_available_now,
    session_windows,
    stateful_ewma,
    stateful_user_stats,
    stream_dedup_exact,
    view_conversion_outer,
    windowed_counts,
)

__all__ = [
    "read_document_stream",
    "read_event_stream",
    "windowed_counts",
    "session_windows",
    "stateful_ewma",
    "stateful_user_stats",
    "stream_dedup_exact",
    "click_attribution",
    "view_conversion_outer",
    "run_available_now",
]
