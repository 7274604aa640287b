"""Structured-Streaming surface over the events stream."""

from .events import (
    cdc_upsert_sink,
    dedup_within_watermark,
    read_event_stream,
    windowed_counts,
)

__all__ = [
    "cdc_upsert_sink",
    "dedup_within_watermark",
    "read_event_stream",
    "windowed_counts",
]
