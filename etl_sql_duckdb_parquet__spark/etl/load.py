"""Load stage: ZSTD-Parquet sinks, hive partitioning, enrichment joins.

Reference parity (SURVEY.md §2.1 S6-S8): ``write_parquet`` is the
reference's ``src/etl/load.py:14-57`` (ZSTD default, optional hive
partition columns — the capability its ``load.py:33-41`` documents);
``enrich_with_dim`` is the broadcast dimension join that attaches
partition keys to facts (ref ``load.py:111-116``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def enrich_with_dim(
    fact: DataFrame, dim: DataFrame, on: str, cols: list[str]
) -> DataFrame:
    """Attach dimension columns to a fact via broadcast left join —
    the dim is small by construction, so no shuffle of the fact side."""
    return fact.join(F.broadcast(dim.select(on, *cols)), on, "left")


def write_csv(df: DataFrame, path: str, sep: str = ",") -> None:
    """CSV export sink (ref ``app.py:349-355``, ``file_upload.py:156-161``)."""
    df.write.mode("overwrite").option("header", True).option("sep", sep).csv(
        path
    )
