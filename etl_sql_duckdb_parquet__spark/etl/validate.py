"""Validation stage: declarative rules → a first-class errors DataFrame.

Reference parity (SURVEY.md §2.2 P2-P5, §2.3 J5): NOT_NULL / UNIQUE /
ENUM / RANGE / FUTURE_DATE / FK rules accumulating ``ValidationError``
records (ref ``src/etl/validate.py:14-25``), with STRICT (fail on any
error) vs QUARANTINE (log & continue) modes (ref ``validate.py:258-304``).

Errors are data, not exceptions: each rule contributes
``(table_name, column, rule, value, n)`` rows built from filtered
selects — fully distributed, one union'd DataFrame, evaluated lazily.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COLS = ["table_name", "column", "rule", "value", "n"]


@dataclass
class Rule:
    """One validation rule; ``violation`` is the predicate that marks a
    BAD row (mirrors the reference's per-rule filter style)."""

    column: str
    name: str
    violation: Column
    params: dict = field(default_factory=dict)


def not_null(column: str) -> Rule:
    return Rule(column, "NOT_NULL", F.col(column).isNull())


def enum(column: str, allowed: list) -> Rule:
    return Rule(
        column,
        "ENUM",
        F.col(column).isNotNull() & ~F.col(column).isin(*allowed),
        {"allowed": allowed},
    )


def in_range(column: str, lo=None, hi=None) -> Rule:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(column) < lo)
    if hi is not None:
        cond = cond | (F.col(column) > hi)
    return Rule(column, "RANGE", cond, {"lo": lo, "hi": hi})


def positive(column: str) -> Rule:
    return Rule(column, "POSITIVE", F.col(column) <= 0)


def no_future_date(column: str, today: str | None = None) -> Rule:
    """Parsed date must not lie in the future (ref ``validate.py:76-90``).
    ``today`` injectable for deterministic tests; try_to_timestamp keeps
    malformed dates NULL (not errors) under ANSI mode."""
    bound = F.lit(today).cast("date") if today else F.current_date()
    parsed = F.try_to_timestamp(
        F.col(column), F.lit("yyyy-MM-dd")
    ).try_cast("date")
    return Rule(column, "FUTURE_DATE", parsed > bound)


def unique(column: str) -> Rule:
    # handled specially in validate() — needs an aggregation, not a filter
    return Rule(column, "UNIQUE", F.lit(False))


def validate(
    df: DataFrame,
    table_name: str,
    rules: list[Rule],
    fk: dict | None = None,
) -> DataFrame:
    """Apply rules; returns the errors DataFrame (empty = valid).

    ``fk``: {column: dim_df_with_that_column} referential checks via
    left-anti join (ref FK validation ``validate.py:239-255`` → J5).
    STRICT mode is the caller asserting ``validate(...).count() == 0``;
    QUARANTINE mode is ``df.join(errors_keys, 'left_anti')``.
    """
    branches = []
    for r in rules:
        if r.name == "UNIQUE":
            b = (
                df.groupBy(F.col(r.column).cast("string").alias("value"))
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
                .select(
                    F.lit(table_name).alias("table_name"),
                    F.lit(r.column).alias("column"),
                    F.lit("UNIQUE").alias("rule"),
                    "value",
                    "n",
                )
            )
        else:
            b = (
                df.filter(r.violation)
                .groupBy(F.col(r.column).cast("string").alias("value"))
                .agg(F.count("*").alias("n"))
                .select(
                    F.lit(table_name).alias("table_name"),
                    F.lit(r.column).alias("column"),
                    F.lit(r.name).alias("rule"),
                    "value",
                    "n",
                )
            )
        branches.append(b)
    for col, dim in (fk or {}).items():
        # BOUNDEDNESS ASSUMPTION: `fk` values are true dimension tables
        # (nation/region-class — constant-cardinality reference sets, not
        # SF-scaling fact slices).  Callers passing a table that grows
        # with data volume must drop to a plain (un-hinted) join and let
        # AQE decide; the hint here exists so the FK check stays a single
        # broadcast anti-join with zero shuffles of the scanned table.
        b = (
            df.join(
                F.broadcast(dim.select(col).distinct()), col, "left_anti"
            )
            .groupBy(F.col(col).cast("string").alias("value"))
            .agg(F.count("*").alias("n"))
            .select(
                F.lit(table_name).alias("table_name"),
                F.lit(col).alias("column"),
                F.lit("FK").alias("rule"),
                "value",
                "n",
            )
        )
        branches.append(b)
    if not branches:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "table_name string, column string, rule string, value string, n long"
        )
    return reduce(DataFrame.unionByName, branches)
