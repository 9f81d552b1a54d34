"""Structured-Streaming surface: incremental encode of continuously
arriving tokenized-sequence files (:mod:`.incremental`), the custom
stateful gap-sessionization operator (:mod:`.sessions`), and watermark-
bounded exact deduplication of a landing feed (:mod:`.dedup`)."""

from .dedup import dedup_stream, run_dedup_available_now
from .incremental import encode_stream, run_available_now
from .sessions import run_sessionize_available_now, sessionize_events

__all__ = [
    "dedup_stream",
    "encode_stream",
    "run_available_now",
    "run_dedup_available_now",
    "run_sessionize_available_now",
    "sessionize_events",
]
