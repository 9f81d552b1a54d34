"""Shared helpers for the query layer."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) as a DataFrame."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def md5_60bit(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT.

    The cross-engine portable hash: DuckDB computes the identical value
    via ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``, which is what
    makes hash-derived operators (q56 SimHash, q61 splits) exactly
    oracle-checkable.  15 hex chars so the value fits a signed 64-bit in
    both engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def epoch_seconds_ntz(col: Column) -> Column:
    """Whole epoch seconds from a TIMESTAMP_NTZ, timezone-free.

    ``timestampdiff`` over NTZ operands never consults the session
    timezone (a cast-based route would, and would shift across DST);
    truncation from a whole-second origin equals the DuckDB oracle's
    ``floor(epoch(ts))`` for positive epochs.
    """
    return F.timestamp_diff(
        "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Parquet tables behind SQL views — the reference's SQL entry point
    (``CREATE VIEW x AS SELECT * FROM read_parquet(...)``, reference
    ``sql/schema.sql:4-11`` / ``src/cli.py:126-133``); after this,
    ``spark.sql(...)`` runs free-form SQL over the same tables."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
