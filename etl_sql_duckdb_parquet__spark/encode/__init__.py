"""DataFrame-level encode/decode jobs over tokenized-sequence tables.

Input shape (the north-star table): ``(doc_id: string, tokens: array<int>,
n_tok: int, source: string)``.  ``synth`` builds it deterministically —
either by tokenizing the driver-provided ``documents.parquet`` with a pure
Spark-SQL hash tokenizer, or fully synthetic at any scale.  ``encode_job``
packs token arrays into per-partition codec blobs with explicit
source-aware salted partitioning; ``manifest`` records per-partition
lineage and makes the job resumable; ``decode_job`` reverses bit-identically.
"""

from .synth import synth_token_table, tokenize_documents
from .encode_job import encode_token_table, plan_partitions
from .decode_job import candidate_parts, lookup_docs
from .maintenance import compact_store, vacuum_store
from .decode_job import decode_token_table, verify_roundtrip
from .manifest import read_manifest

__all__ = [
    "synth_token_table",
    "tokenize_documents",
    "encode_token_table",
    "plan_partitions",
    "candidate_parts",
    "lookup_docs",
    "compact_store",
    "vacuum_store",
    "decode_token_table",
    "verify_roundtrip",
    "read_manifest",
]
