"""End-to-end ETL pipeline: ingest → validate → transform → load.

The reference's 4-stage flow (``src/cli.py:31-99``) as one function over
lazy DataFrames.  STRICT mode fails on any validation error; QUARANTINE
mode splits flagged rows out and loads the clean remainder (the
reference logs-and-continues, ``cli.py:76`` leaves the split as a TODO —
here it is implemented).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .history import EventLog
from .ingest import ingest_file
from .load import write_parquet
from .transform import dedup_keep_last
from .validate import Rule, validate


@dataclass
class TableSpec:
    """Per-table pipeline configuration."""

    file: str
    key: str | None = None  # dedup keep-last key
    columns: dict[str, Column] = field(default_factory=dict)  # name → expr
    rules: list[Rule] = field(default_factory=list)
    fk: dict | None = None


def run_pipeline(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    specs: dict[str, TableSpec],
    mode: str = "strict",
    ingested_at: str | None = None,
) -> dict:
    """Run the 4 stages for every table; returns per-table row counts.

    ``mode='strict'``: any validation error raises.
    ``mode='quarantine'``: rows whose key appears in the errors are
    written to ``<out>/quarantine/<table>``; clean rows are loaded.

    Every stage (ingest/transform/validate/load, per table) is recorded in
    the ``<out>/events`` Parquet table (see :mod:`.history` — the
    reference's ``pipeline_events`` audit trail), including an error event
    when a strict-mode run aborts.
    """
    report: dict = {"mode": mode, "tables": {}}
    events = EventLog(spark, out_dir)
    report["run_id"] = events.run_id
    try:
        _run_stages(
            spark, raw_dir, out_dir, specs, mode, ingested_at, report, events
        )
        events.end("_run", "pipeline", "ok", message=mode)
    except Exception as exc:  # record the failure, then re-raise
        events.end("_run", "pipeline", "error", message=str(exc)[:500])
        raise
    finally:
        events.flush()
    return report


def _run_stages(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    specs: dict[str, TableSpec],
    mode: str,
    ingested_at: str | None,
    report: dict,
    events: EventLog,
) -> None:
    events.start("_run", "pipeline")
    staged: dict[str, DataFrame] = {}
    for name, spec in specs.items():
        events.start(name, "ingest")
        raw = ingest_file(
            spark, os.path.join(raw_dir, spec.file), ingested_at=ingested_at
        )
        events.end(name, "ingest")
        events.start(name, "transform")
        cols = [expr.alias(col) for col, expr in spec.columns.items()]
        typed = raw.select(*cols, "_ingest_order")
        if spec.key:
            typed = dedup_keep_last(typed, spec.key)
        staged[name] = typed.drop("_ingest_order")
        events.end(name, "transform")

    for name, spec in specs.items():
        fk = {
            col: staged[dim] if isinstance(dim, str) else dim
            for col, dim in (spec.fk or {}).items()
        }
        events.start(name, "validate")
        errors = validate(staged[name], name, spec.rules, fk=fk)
        n_err = errors.count()
        events.end(name, "validate", n_rows=n_err)
        df = staged[name]
        events.start(name, "load")
        if n_err and mode == "strict":
            sample = [r.asDict() for r in errors.limit(5).collect()]
            events.end(name, "load", "error", message="strict-mode abort")
            raise ValueError(
                f"validation failed for {name}: {n_err} error rows; "
                f"first: {sample}"
            )
        if n_err and mode == "quarantine" and spec.key:
            bad_keys = (
                errors.filter(F.col("column") == spec.key)
                .select(F.col("value").alias(spec.key))
                .distinct()
            )
            # null-safe compare: a row flagged because its key IS NULL must
            # still match its own (NULL) error key, else it would leak into
            # the curated load.  No broadcast hint: error-key cardinality
            # is input-scale in the worst case (a systemically bad feed),
            # so let AQE pick — a shuffled semi/anti on the key is the
            # scale-safe plan, and AQE still broadcasts small sets.
            quarantined = df.join(
                bad_keys,
                df[spec.key].cast("string").eqNullSafe(bad_keys[spec.key]),
                "left_semi",
            )
            write_parquet(
                quarantined, os.path.join(out_dir, "quarantine", name)
            )
            df = df.join(
                bad_keys,
                df[spec.key].cast("string").eqNullSafe(bad_keys[spec.key]),
                "left_anti",
            )
        write_parquet(df, os.path.join(out_dir, "curated", name))
        rows_loaded = spark.read.parquet(
            os.path.join(out_dir, "curated", name)
        ).count()
        events.end(name, "load", n_rows=rows_loaded)
        report["tables"][name] = {
            "rows_loaded": rows_loaded,
            "n_validation_errors": n_err,
        }
