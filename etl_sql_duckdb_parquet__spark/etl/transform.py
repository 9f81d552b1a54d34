"""Transform stage: canonicalization + coerce-casts + keep-last dedup.

Reference parity (SURVEY.md §2.8 F1-F8, §2.5 W4):
- null canonicalization "NA"/"null"/"NULL"/"" → NULL after trim
  (ref ``src/etl/transform.py:13-14``)
- coerce casts: invalid numeric/date → NULL, never an error
  (ref ``transform.py:20-27``; Spark non-ANSI cast semantics match)
- boolean parse lower(x) ∈ {true,1,yes} (ref ``transform.py:118-124``)
- dedup keep-LAST by key in ingest order (ref ``transform.py:51-56``) —
  requires the explicit ``_ingest_order`` column from ingest, since Spark
  has no implicit row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NULL_TOKENS = ("NA", "null", "NULL", "")


def null_canonicalize(col: str | Column) -> Column:
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c.isin(*NULL_TOKENS), None).otherwise(c)


def safe_cast(col: str | Column, dtype: str) -> Column:
    """Coerce-cast: malformed values become NULL (pandas
    ``errors='coerce'`` semantics).  ``try_cast`` keeps this true under
    Spark 4's default ANSI mode, where a plain cast would throw."""
    c = null_canonicalize(col)
    return c.try_cast(dtype)


def to_date_safe(col: str | Column, fmt: str = "yyyy-MM-dd") -> Column:
    """NULL on malformed dates (e.g. dirty '2024-13-40' —
    ref dataset defect list README_DATASET.md:5-13); ANSI-safe."""
    return F.try_to_timestamp(null_canonicalize(col), F.lit(fmt)).try_cast(
        "date"
    )


def parse_bool(col: str | Column) -> Column:
    c = null_canonicalize(col)
    return F.when(c.isNull(), None).otherwise(
        F.lower(c).isin("true", "1", "yes")
    )


def dedup_keep_last(
    df: DataFrame, key: str | list[str], order_col: str = "_ingest_order"
) -> DataFrame:
    """Keep the LAST occurrence per key in ingest order (ref W4)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
