"""Store maintenance: compaction + vacuum (Iceberg-style housekeeping).

A streaming-ingested store accumulates one snapshot per micro-batch
(epoch-scoped, ``streaming/incremental.py``); each is correct but small —
after N waves a ``decode(snapshots="all")`` unions N snapshots' blobs.
``compact_store`` re-encodes the union as ONE new snapshot (full-size
partitions, fresh codec selection over the merged value distribution);
``vacuum_store`` then drops everything the latest snapshot superseded —
old run directories under ``blobs/``, their manifest rows, and their
plan files.  This is the maintenance loop the reference's background
scheduler performed for its Parquet outputs (``src/scheduler.py:17-131``),
reshaped for the snapshot/manifest store.

Scale design: compaction is just decode→encode — both ends are the
distributed mapInArrow engine, no driver data path; vacuum touches only
metadata (the manifest) plus directory deletes.  Not concurrency-safe:
run maintenance while no readers/writers are active (same contract as
Iceberg's ``expire_snapshots``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .decode_job import decode_token_table
from .encode_job import DEFAULT_TARGET_TOKENS, encode_token_table
from .manifest import blobs_path, manifest_path, plan_path, read_manifest


def _require_filesystem(out_dir: str) -> str:
    if "://" in out_dir and not out_dir.startswith("file:"):
        raise NotImplementedError(
            "vacuum_store operates on filesystem stores; for object "
            "stores run it from a host with the store mounted, or prune "
            "via the object-store's own lifecycle tooling"
        )
    return out_dir[len("file:"):] if out_dir.startswith("file:") else out_dir


def compact_store(
    spark: SparkSession,
    out_dir: str,
    target_tokens: int = DEFAULT_TARGET_TOKENS,
    vacuum: bool = True,
) -> dict:
    """Merge every snapshot into one, then (by default) vacuum.

    No-ops (returns ``{"compacted": False, ...}``) when the store already
    holds a single snapshot.  The compacted snapshot's id is
    content-addressed with a ``compact`` salt, so re-compacting an
    unchanged store resumes to a no-op instead of re-encoding.

    ``vacuum=False`` defers the cleanup, but then the old snapshots AND
    the compacted one coexist — a second compact before vacuuming would
    union both and double-count; vacuum before compacting again.
    """
    manifest = read_manifest(spark, out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    snaps = [
        r["snapshot_id"]
        for r in manifest.filter(F.col("status") == "ok")
        .select("snapshot_id")
        .distinct()
        .collect()
    ]
    if len(snaps) <= 1:
        return {"compacted": False, "n_snapshots": len(snaps)}
    union = decode_token_table(spark, out_dir, snapshots="all")
    stats = encode_token_table(
        spark,
        union,
        out_dir,
        target_tokens=target_tokens,
        resume=True,
        snapshot_salt="compact",
    )
    result = {
        "compacted": True,
        "n_snapshots_merged": len(snaps),
        **{f"encode_{k}": v for k, v in stats.items()},
    }
    if vacuum:
        result["vacuum"] = vacuum_store(spark, out_dir)
    return result


def vacuum_store(spark: SparkSession, out_dir: str) -> dict:
    """Keep only the latest snapshot; reclaim everything it superseded.

    Deletes blob ``run_id=...`` directories not referenced by the latest
    snapshot, rewrites the manifest to that snapshot's rows, and drops
    other snapshots' plan files.  After vacuum,
    ``decode(snapshots="all") == decode(snapshots="latest")``.

    The manifest swap is write-new → rename-old-away → rename-new-in; a
    crash between the two renames leaves the store readable by renaming
    ``manifest_vacuum_old`` back (blobs are only deleted after the swap
    completes, so no data is at risk in that window).
    """
    local = _require_filesystem(out_dir)
    manifest = read_manifest(spark, out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    ok = manifest.filter(F.col("status") == "ok")
    latest = (
        ok.orderBy(F.desc("finished_at"), F.desc("run_id"))
        .select("snapshot_id")
        .first()
    )
    if latest is None:
        raise ValueError(f"no status='ok' manifest rows under {out_dir}")
    snap = latest["snapshot_id"]
    keep_runs = {
        r["run_id"]
        for r in ok.filter(F.col("snapshot_id") == snap)
        .select("run_id")
        .distinct()
        .collect()
    }

    # rewrite the manifest to the surviving snapshot's rows (write-new,
    # swap, drop-old; manifest is metadata-sized)
    mpath = manifest_path(local)
    tmp = mpath + "_vacuum_tmp"
    old = mpath + "_vacuum_old"
    shutil.rmtree(tmp, ignore_errors=True)
    manifest.filter(F.col("snapshot_id") == snap).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(mpath, old)
    os.rename(tmp, mpath)
    shutil.rmtree(old)

    # drop superseded blob run directories
    bdir = blobs_path(local)
    bytes_reclaimed = 0
    n_deleted = 0
    for entry in os.listdir(bdir):
        if not entry.startswith("run_id="):
            continue
        if entry.split("=", 1)[1] in keep_runs:
            continue
        victim = os.path.join(bdir, entry)
        for root, _dirs, files in os.walk(victim):
            bytes_reclaimed += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
        shutil.rmtree(victim)
        n_deleted += 1

    # drop other snapshots' plan files (Spark-written part files from
    # remote-era appends are left for read-side distinct() to dedupe)
    pdir = plan_path(local)
    if os.path.isdir(pdir):
        for entry in os.listdir(pdir):
            if entry.startswith("plan-") and entry != f"plan-{snap}.parquet":
                os.remove(os.path.join(pdir, entry))

    return {
        "kept_snapshot": snap,
        "n_runs_kept": len(keep_runs),
        "n_run_dirs_deleted": n_deleted,
        "bytes_reclaimed": bytes_reclaimed,
    }
