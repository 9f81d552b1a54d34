"""Schema inspection / diffing — reference ``src/schema_inspector.py``.

- parquet_schema / csv_schema (ref ``schema_inspector.py:12-41,44-67``):
  inspect file schemas as plain dicts
- compare_schemas (ref ``:70-95``): common / missing / new columns + type
  changes
- validate_compatibility (ref ``:125-151``): is `candidate` safe to load
  where `expected` is required (missing required columns are errors,
  extra columns are warnings, type mismatches are errors)

Driver-side metadata ops on ``df.schema`` — no data is read beyond
footers/headers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .ingest import detect_separator, normalize_columns


def parquet_schema(spark: SparkSession, path: str) -> dict[str, str]:
    df = spark.read.parquet(path)
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def csv_schema(
    spark: SparkSession, path: str, sep: str | None = None
) -> dict[str, str]:
    """Header-derived schema; types sampled via Spark's CSV inference."""
    sep = sep or detect_separator(spark, path)
    df = normalize_columns(
        spark.read.option("sep", sep)
        .option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def compare_schemas(a: dict[str, str], b: dict[str, str]) -> dict:
    common = sorted(set(a) & set(b))
    return {
        "common": common,
        "only_in_a": sorted(set(a) - set(b)),
        "only_in_b": sorted(set(b) - set(a)),
        "type_changes": {
            c: (a[c], b[c]) for c in common if a[c] != b[c]
        },
        "identical": a == b,
    }


def validate_compatibility(
    expected: dict[str, str], candidate: dict[str, str]
) -> dict:
    """Can data shaped like ``candidate`` be loaded as ``expected``?"""
    errors, warnings = [], []
    for col, typ in expected.items():
        if col not in candidate:
            errors.append(f"missing required column: {col}")
        elif candidate[col] != typ:
            errors.append(
                f"type mismatch for {col}: expected {typ}, got {candidate[col]}"
            )
    for col in candidate:
        if col not in expected:
            warnings.append(f"unexpected extra column: {col}")
    return {"compatible": not errors, "errors": errors, "warnings": warnings}
