"""ETL capability layer — the reference's 4-stage pipeline (ingest →
validate → transform → load, reference ``src/cli.py:31-99``) re-expressed
as lazy DataFrame transforms.

Stage modules: :mod:`ingest` (CSV/TSV scan + audit columns),
:mod:`validate` (rule engine → errors DataFrame), :mod:`transform`
(canonicalization, coerce-casts, keep-last dedup), :mod:`load`
(ZSTD-Parquet sinks + enrichment join), :mod:`profiling` (per-column
stats, quality score, outliers).
"""

from .ingest import detect_separator, ingest_file, normalize_columns
from .load import enrich_with_dim, write_parquet
from .profiling import profile_columns, quality_score
from .transform import (
    dedup_keep_last,
    null_canonicalize,
    parse_bool,
    safe_cast,
    to_date_safe,
)
from .validate import Rule, validate

__all__ = [
    "detect_separator",
    "ingest_file",
    "normalize_columns",
    "Rule",
    "validate",
    "null_canonicalize",
    "safe_cast",
    "to_date_safe",
    "parse_bool",
    "dedup_keep_last",
    "write_parquet",
    "enrich_with_dim",
    "profile_columns",
    "quality_score",
]
