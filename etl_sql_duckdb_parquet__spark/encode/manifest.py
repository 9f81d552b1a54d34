"""Checkpoint/lineage manifest — the engine's resumability layer.

Plays the role of the reference's SQLite run-history audit trail
(reference ``src/history.py:22-48``: per-run status, row counts, duration)
and its per-row audit columns (reference ``src/etl/ingest.py:53-58``),
reshaped for a distributed encode job: one append-only Parquet table with
one row per encoded partition::

    (run_id, snapshot_id, part_id, codec, n_docs, n_tokens,
     raw_bytes, comp_bytes, encode_s, checksum, status, finished_at)

Resume = anti-join of the planned partition list against committed
manifest rows for the same input snapshot — only missing/failed partitions
are re-encoded.  Spark has no built-in batch resume; this is ours.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "run_id string, snapshot_id string, part_id int, codec string, "
    "n_docs long, n_tokens long, raw_bytes long, comp_bytes long, "
    "encode_s double, checksum long, "
    "n_distinct long, n_runs long, vmin long, vmax long, "
    "status string, finished_at timestamp"
)

MANIFEST_COLS = [f.split(" ")[0] for f in MANIFEST_SCHEMA.split(", ")]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def blobs_path(out_dir: str) -> str:
    return os.path.join(out_dir, "blobs")


def plan_path(out_dir: str) -> str:
    """The persisted doc→partition mapping (one row per source per run):
    ``part_id = offset + pmod(xxhash64(doc_id), salts)``."""
    return os.path.join(out_dir, "plan")


def append_running_marker(
    spark: SparkSession, out_dir: str, run_id: str, snapshot_id: str
) -> None:
    """One run-level ``status='running'`` manifest row, written BEFORE the
    encode starts moving data.

    Lets maintenance see runs that may still be writing blobs: a run_id
    with a running row and no ok rows is in-flight (or died — the marker
    alone can't tell, its timestamp is the run START), and
    :func:`maintenance.vacuum_store` refuses to reclaim blob directories
    while any such run exists (``force=True`` overrides and clears the
    marker).
    Every reader filters ``status == 'ok'``, so the marker is invisible to
    decode/resume.  Filesystem stores get a driver-side pyarrow write
    (the row is metadata-sized; a Spark write job costs ~1 s of fixed
    overhead per encode run); remote URIs go through a Spark append.
    """
    # Both writers derive the row from MANIFEST_SCHEMA — the single source
    # of truth — so a schema change cannot leave marker files with a
    # divergent layout in the append-only manifest directory (mixed file
    # schemas read back nondeterministically under mergeSchema=false).
    fields = [tuple(f.rsplit(" ", 1)) for f in MANIFEST_SCHEMA.split(", ")]
    fixed = {
        "run_id": run_id,
        "snapshot_id": snapshot_id,
        "part_id": -1,
        "status": "running",
    }
    mpath = manifest_path(out_dir)
    if "://" not in mpath or mpath.startswith("file:"):
        import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_types = {
            "string": pa.string(),
            "int": pa.int32(),
            "long": pa.int64(),
            "double": pa.float64(),
            "timestamp": pa.timestamp("us", tz="UTC"),
        }
        local = mpath[len("file:"):] if mpath.startswith("file:") else mpath
        os.makedirs(local, exist_ok=True)
        now = datetime.datetime.now(datetime.timezone.utc)
        tbl = pa.table(
            {
                name: pa.array(
                    [now if name == "finished_at" else fixed.get(name)],
                    pa_types[typ],
                )
                for name, typ in fields
            }
        )
        pq.write_table(tbl, os.path.join(local, f"marker-{run_id}.parquet"))
        return
    marker = spark.range(1).select(
        *[
            (
                F.current_timestamp()
                if name == "finished_at"
                else F.lit(fixed.get(name))
            )
            .cast(typ)
            .alias(name)
            for name, typ in fields
        ]
    )
    append_manifest(marker, out_dir)


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = manifest_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # first run: no manifest yet


def append_manifest(df: DataFrame, out_dir: str) -> None:
    df.select(*MANIFEST_COLS).write.mode("append").parquet(manifest_path(out_dir))


def completed_parts(
    spark: SparkSession, out_dir: str, snapshot_id: str
) -> DataFrame | None:
    """part_ids already encoded OK for this exact input snapshot."""
    m = read_manifest(spark, out_dir)
    if m is None:
        return None
    return (
        m.filter((F.col("snapshot_id") == snapshot_id) & (F.col("status") == "ok"))
        .select("part_id")
        .distinct()
    )


def snapshot_id_of(df: DataFrame) -> str:
    """Deterministic fingerprint of the input table (content-addressed).

    Order-insensitive: count + token sum + xor-style aggregate of per-doc
    hashes.  One cheap aggregate action; replaces an Iceberg snapshot id in
    environments without a table format.
    """
    row = df.select(
        F.count("*").alias("n"),
        F.sum("n_tok").alias("s"),
        F.expr("bit_xor(xxhash64(doc_id, n_tok))").alias("h"),
    ).first()
    return f"snap_{row['n']}_{row['s']}_{(row['h'] or 0) & 0xFFFFFFFFFFFF:012x}"
