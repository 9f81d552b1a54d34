"""Profiling: per-column statistics, quality score, IQR outliers.

Reference parity (SURVEY.md §2.4 A7-A12): per-column count / nulls /
n-unique / min / max / mean / std / completeness (ref
``src/profiling.py:12-42``), weighted quality score (ref
``profiling.py:104-107``), IQR outlier bounds (ref ``profiling.py:69-81``).
All single-pass native aggregations — one job per table, no Python in
the data path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: the reference's profile dict as a DataFrame."""
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "double", "float", "short", "decimal")
    }
    branches = []
    for c in cols:
        is_num = c in numeric
        branches.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                (F.min(c).cast("double") if is_num else F.lit(None).cast("double")).alias("min_v"),
                (F.max(c).cast("double") if is_num else F.lit(None).cast("double")).alias("max_v"),
                (F.avg(c) if is_num else F.lit(None).cast("double")).alias("mean_v"),
                (F.stddev_samp(c) if is_num else F.lit(None).cast("double")).alias("std_v"),
                (
                    F.lit(None).cast("int")
                    if is_num
                    else F.max(F.length(c)).cast("int")
                ).alias("max_len"),
                F.round(
                    100.0
                    * (
                        F.count("*")
                        - F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    )
                    / F.count("*"),
                    2,
                ).alias("completeness_pct"),
            )
        )
    return reduce(DataFrame.unionByName, branches)


def quality_score(df: DataFrame, key_cols: list[str]) -> dict:
    """Weighted missing-rate + duplicate-rate score (ref
    ``profiling.py:104-107``): 100 − 50·missing_rate − 50·dup_rate."""
    n = df.count()
    if n == 0:
        return {"n_rows": 0, "score": 100.0}
    n_cells = n * len(df.columns)
    row = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in df.columns
        ]
    ).first()
    n_missing = sum(row[c] or 0 for c in df.columns)
    n_dups = n - df.dropDuplicates(key_cols).count()
    missing_rate = n_missing / n_cells
    dup_rate = n_dups / n
    return {
        "n_rows": n,
        "missing_rate": round(missing_rate, 6),
        "dup_rate": round(dup_rate, 6),
        "score": round(100.0 - 50.0 * missing_rate - 50.0 * dup_rate, 2),
    }


def iqr_outlier_bounds(df: DataFrame, column: str, k: float = 1.5) -> dict:
    """Exact quartiles + Tukey fences (ref ``profiling.py:69-81``)."""
    row = df.agg(
        F.expr(f"percentile({column}, 0.25)").alias("q1"),
        F.expr(f"percentile({column}, 0.75)").alias("q3"),
    ).first()
    q1, q3 = row["q1"], row["q3"]
    iqr = q3 - q1
    return {"q1": q1, "q3": q3, "lo": q1 - k * iqr, "hi": q3 + k * iqr}
