"""Ingest stage: CSV/TSV scan with separator auto-detect, column-name
normalization, audit/lineage columns, deterministic ingest order.

Reference parity (SURVEY.md §2.1):
- S1 separator auto-detect + all-string read (ref ``src/etl/ingest.py:14-21,47``)
- S2 lowercase/strip column names (ref ``ingest.py:50``)
- S3 audit columns ingested_at / source_file / row_hash (ref ``ingest.py:53-58``)
  — the reference's ONLY per-row Python op (``df.apply`` SHA256) becomes a
  native ``F.sha2(concat_ws(...))`` expression (input_hint: no per-row Python)
- W4 precondition: ``_ingest_order`` captured at scan so keep-last dedup is
  well-defined (Spark has no implicit row order; SURVEY.md §2.5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

AUDIT_SEP = "\x1f"


def detect_separator(spark: SparkSession, path: str) -> str:
    """Pick the separator with the most hits in the header line
    (ref ``src/etl/ingest.py:14-21``: counts of ``,``/``\\t``/``;``)."""
    header = spark.read.text(path).first()
    line = header["value"] if header else ""
    counts = {sep: line.count(sep) for sep in (",", "\t", ";")}
    return max(counts, key=lambda s: (counts[s], s == ","))


def normalize_columns(df: DataFrame) -> DataFrame:
    """Lowercase + strip all column names (ref ``ingest.py:50``)."""
    return df.toDF(*[c.lower().strip() for c in df.columns])


def ingest_file(
    spark: SparkSession,
    path: str,
    sep: str | None = None,
    ingested_at: str | None = None,
) -> DataFrame:
    """Read a delimited file all-string (typing deferred to transform,
    exactly like the reference's ``dtype=str`` read) + audit columns.

    ``ingested_at`` injectable for deterministic tests (SURVEY.md §7.3:
    no wall-clock nondeterminism in the data path).
    """
    sep = sep or detect_separator(spark, path)
    header_cols = [
        c.strip() for c in spark.read.text(path).first()["value"].split(sep)
    ]
    schema = StructType(
        [StructField(c, StringType(), True) for c in header_cols]
    )
    df = (
        spark.read.option("sep", sep)
        .option("header", True)
        .schema(schema)
        .csv(path)
    )
    df = normalize_columns(df)
    data_cols = list(df.columns)
    row_hash = F.sha2(
        F.concat_ws(
            AUDIT_SEP, *[F.coalesce(F.col(c), F.lit("null")) for c in data_cols]
        ),
        256,
    )
    ts = (
        F.lit(ingested_at).cast("timestamp")
        if ingested_at
        else F.current_timestamp()
    )
    return (
        df.withColumn("ingested_at", ts)
        .withColumn("source_file", F.input_file_name())
        .withColumn("row_hash", row_hash)
        .withColumn("_ingest_order", F.monotonically_increasing_id())
    )


def ingest_dir(
    spark: SparkSession,
    raw_dir: str,
    spec: dict[str, str],
    ingested_at: str | None = None,
) -> dict[str, DataFrame]:
    """Multi-file directory ingest (ref ``src/etl/ingest.py:64-87``):
    ``spec`` maps table name → file name under ``raw_dir``."""
    import os

    return {
        name: ingest_file(
            spark, os.path.join(raw_dir, fname), ingested_at=ingested_at
        )
        for name, fname in spec.items()
    }


def merge_files(dfs: list[DataFrame]) -> DataFrame:
    """Union-by-name merge of uploaded files (ref
    ``src/file_upload.py:136-168``); columns missing in some inputs
    become NULL."""
    from functools import reduce

    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
