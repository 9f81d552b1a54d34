"""Shared helpers for the query layer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) as a DataFrame."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Parquet tables behind SQL views — the reference's SQL entry point
    (``CREATE VIEW x AS SELECT * FROM read_parquet(...)``, reference
    ``sql/schema.sql:4-11`` / ``src/cli.py:126-133``); after this,
    ``spark.sql(...)`` runs free-form SQL over the same tables."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
