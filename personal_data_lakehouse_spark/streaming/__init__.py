"""Structured Streaming operators (SURVEY.md §2.9 upgrade path)."""

from personal_data_lakehouse_spark.streaming.windows import (
    sessionized_stream,
    sliding_counts,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "sessionized_stream",
]
