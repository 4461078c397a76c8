"""Structured Streaming extensions (beyond reference parity).

The reference's "streaming" is chunked batch paging over a static table
(SURVEY §1.3); these are the true-streaming equivalents for the 100 TB
engine: watermarked event-time aggregation, session windows, and
micro-batch sinks reusing the batch workers via ``foreachBatch``.
"""

from .events import (
    sessionized_stream,
    stream_events_from_dir,
    windowed_event_counts,
)

__all__ = [
    "stream_events_from_dir",
    "windowed_event_counts",
    "sessionized_stream",
]
