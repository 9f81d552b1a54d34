"""Structured-Streaming surface: incremental encode of continuously
arriving tokenized-sequence files (see :mod:`.incremental`)."""

from .incremental import encode_stream, run_available_now

__all__ = ["encode_stream", "run_available_now"]
