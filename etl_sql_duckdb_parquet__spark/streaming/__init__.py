"""Structured-Streaming surface: incremental encode of continuously
arriving tokenized-sequence files (:mod:`.incremental`) and the custom
stateful gap-sessionization operator (:mod:`.sessions`)."""

from .incremental import encode_stream, run_available_now
from .sessions import run_sessionize_available_now, sessionize_events

__all__ = [
    "encode_stream",
    "run_available_now",
    "run_sessionize_available_now",
    "sessionize_events",
]
