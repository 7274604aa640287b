"""Structured-Streaming surface over the events stream."""

from . import kafka
from .events import (
    cdc_upsert_sink,
    dedup_within_watermark,
    read_event_stream,
    session_counts,
    stateful_running_totals,
    windowed_counts,
)

__all__ = [
    "cdc_upsert_sink",
    "dedup_within_watermark",
    "kafka",
    "read_event_stream",
    "session_counts",
    "stateful_running_totals",
    "windowed_counts",
]
