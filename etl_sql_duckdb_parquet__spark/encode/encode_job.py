"""The encode job: token table → per-partition codec blobs + manifest.

DataFrame program (SURVEY.md §7.0a):

1. :func:`plan_partitions` — EXPLICIT partition assignment.  Default mode is
   source-aware + salted: partitions are source-homogeneous (same-source
   token streams share statistics → better codec fits), and each source gets
   ``ceil(source_tokens / target_tokens)`` salt buckets keyed by
   ``xxhash64(doc_id)`` — a 70%-hot source is split across proportionally
   many partitions instead of melting one executor.  This is the skew
   handling the AQE can't do for groupBy-aggregate workloads.
2. One ``groupBy(part_id).applyInPandas`` — the single shuffle of the job.
   Inside the UDF everything is vectorized numpy over Arrow batches
   (no per-row Python; reference's only per-row op, the row hash at
   ``src/etl/ingest.py:56-58``, is replaced by vectorized checksums).
3. Blobs written as uncompressed Parquet (our codecs ARE the compression;
   a codec on top would contaminate the size measurement), partitioned by
   run so re-runs never collide; manifest rows appended per partition.

Resume: planned parts are anti-joined against the manifest before encoding
(only missing/failed partitions run), making the job idempotent per input
snapshot — kill it anywhere and re-run.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import encode_strings
from ..codecs.core import encode_int_best, encode_int_best_with_stats
from ..codecs.core import CODEC_IDS, codec_of, zunwrap, zwrap_best
from .manifest import (
    append_manifest,
    append_running_marker,
    blobs_path,
    completed_parts,
    plan_path,
)

DEFAULT_TARGET_TOKENS = 2_000_000

# blob rows carry exactly 5 data columns + one JSON metadata column —
# every extra column costs per-file footer bytes (schema + column-chunk
# metadata) across millions of files at 100 TB scale
ENCODED_SCHEMA = "part_id int, tokens_blob binary, lengths_blob binary, docids_blob binary, sources_blob binary, meta string"

META_SCHEMA = (
    "codec string, n_docs long, n_tokens long, raw_bytes long, "
    "comp_bytes long, encode_s double, checksum long, "
    "n_distinct long, n_runs long, vmin long, vmax long"
)


def input_stats(df: DataFrame) -> tuple[list, str]:
    """ONE aggregation pass over the input: per-source token shares (for
    the partition plan) + the content-addressed snapshot fingerprint.

    At 100 TB a full input scan is the dominant cost — folding the
    snapshot hash (``manifest.snapshot_id_of`` semantics: count, token
    sum, xor of per-doc hashes — all decomposable) into the planning
    aggregate means the job scans the input exactly twice total
    (plan+snapshot, then encode) instead of three times.

    NULL contract: the same pass rejects NULL ``source``/``doc_id``/
    ``tokens``/``n_tok`` rows with a clear error.  Silently they would be
    far worse: a NULL source never matches the plan equi-join (the doc
    vanishes from the store while the snapshot fingerprint counts it, so
    resume believes it encoded), and a NULL tokens array round-trips
    through Arrow as NaN→INT64_MIN in the lengths blob — a durably
    committed corrupt partition.
    """
    rows = (
        df.groupBy("source")
        .agg(
            F.sum("n_tok").alias("tok"),
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(doc_id, n_tok))").alias("h"),
            F.sum(F.col("doc_id").isNull().cast("long")).alias("_null_id"),
            F.sum(F.col("tokens").isNull().cast("long")).alias("_null_tok"),
            F.sum(F.col("n_tok").isNull().cast("long")).alias("_null_n"),
        )
        .collect()
    )
    nulls = {
        "source": sum(r["n"] for r in rows if r["source"] is None),
        "doc_id": sum(r["_null_id"] or 0 for r in rows),
        "tokens": sum(r["_null_tok"] or 0 for r in rows),
        "n_tok": sum(r["_null_n"] or 0 for r in rows),
    }
    if any(nulls.values()):
        raise ValueError(
            "encode input contains NULLs ("
            + ", ".join(f"{k}: {v} rows" for k, v in nulls.items() if v)
            + ") — clean upstream first (e.g. etl.transform coercions + a "
            "filter); encoding them would silently drop or corrupt docs"
        )
    rows = sorted(rows, key=lambda r: r["source"])
    n = sum(r["n"] for r in rows)
    s = sum(r["tok"] or 0 for r in rows)
    h = 0
    for r in rows:
        h ^= r["h"] or 0
    snapshot_id = f"snap_{n}_{s}_{h & 0xFFFFFFFFFFFF:012x}"
    return rows, snapshot_id


def plan_partitions(
    df: DataFrame,
    target_tokens: int = DEFAULT_TARGET_TOKENS,
    by_source: bool = True,
    shares: list | None = None,
) -> tuple[DataFrame, int, list]:
    """Assign an explicit ``part_id`` to every doc; returns
    (df, n_parts, plan_rows).

    ``by_source=True``: contiguous part-id ranges per source, salted by
    doc-id hash, salt count ∝ the source's token mass (skew-proof).
    ``by_source=False``: plain uniform ``xxhash64(doc_id) mod n``.
    ``shares``: precomputed per-source rows from :func:`input_stats`
    (avoids an extra input scan).

    ``plan_rows`` is the deterministic doc→partition mapping as
    ``(source, offset, salts)`` tuples (``(None, 0, n_parts)`` for the
    uniform plan): ``part_id = offset + pmod(xxhash64(doc_id), salts)``.
    Persisted beside the manifest so point lookups can recompute a doc's
    partition instead of scanning the store (:func:`decode_job.lookup_docs`).
    """
    spark = df.sparkSession
    if by_source:
        if shares is None:
            shares, _ = input_stats(df)
        # Hot sources get ceil(tok/target) salted partitions of their own;
        # small sources are greedily bin-packed into shared partitions so a
        # long tail of sources can't explode the partition count (and with
        # it per-partition codec-table overhead).
        rows, off = [], 0
        bin_tok = 0
        bin_open = False
        for r in shares:
            tok = r["tok"] or 0
            if tok >= target_tokens // 2:
                if bin_open:
                    off += 1
                    bin_open, bin_tok = False, 0
                salts = max(1, math.ceil(tok / target_tokens))
                rows.append((r["source"], off, salts))
                off += salts
            else:
                if bin_open and bin_tok + tok > target_tokens:
                    off += 1
                    bin_tok = 0
                rows.append((r["source"], off, 1))
                bin_tok += tok
                bin_open = True
        if bin_open:
            off += 1
        n_parts = off
        plan = spark.createDataFrame(
            rows, "source string, _offset int, _salts int"
        )
        out = (
            df.join(F.broadcast(plan), "source")
            .withColumn(
                "part_id",
                (
                    F.col("_offset")
                    + F.pmod(F.xxhash64("doc_id"), F.col("_salts"))
                ).cast("int"),
            )
            .drop("_offset", "_salts")
        )
        return out, n_parts, rows
    if shares is None:
        shares, _ = input_stats(df)
    total = sum(r["tok"] or 0 for r in shares)
    n_parts = max(1, math.ceil(total / target_tokens))
    out = df.withColumn(
        "part_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int")
    )
    return out, n_parts, [(None, 0, n_parts)]


def _encode_blob_row(
    part_id: int,
    values: np.ndarray,
    lengths: np.ndarray,
    docids: list,
    sources: list,
    t_acc: float,
) -> dict:
    """Encode one logical partition's accumulated columns → blob row dict."""
    t0 = time.perf_counter()
    if len(values) > 2**31 - 1:
        # the decode path materializes Arrow ListArray offsets as int32;
        # fail the encode rather than durably committing an undecodable
        # partition (reachable only via a single >2^31-token doc or an
        # absurd target_tokens — both worth a loud stop)
        raise ValueError(
            f"partition {part_id} holds {len(values)} tokens, beyond the "
            "int32 Arrow list-offset range — lower target_tokens or split "
            "the oversized document"
        )
    # per-column light codec first, then an optional DEFLATE entropy layer
    # where it still wins ≥2% (the reference's own layering: Parquet light
    # encodings + ZSTD on top)
    raw_tokens_blob, tok_stats = encode_int_best_with_stats(values)
    tokens_blob = zwrap_best(raw_tokens_blob)
    lengths_blob = zwrap_best(encode_int_best(lengths))
    docids_blob = zwrap_best(encode_strings(docids))
    sources_blob = zwrap_best(encode_strings(sources))
    raw_bytes = (
        4 * len(values)
        + 4 * len(lengths)
        + sum(len(d.encode("utf-8")) for d in docids)
        + sum(len(s.encode("utf-8")) for s in sources)
    )
    comp_bytes = (
        len(tokens_blob) + len(lengths_blob) + len(docids_blob) + len(sources_blob)
    )
    checksum = int(
        values.astype(np.uint64, copy=False).sum(dtype=np.uint64)
        & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
    )
    inner_codec = codec_of(zunwrap(tokens_blob))
    if tokens_blob and tokens_blob[0] in (CODEC_IDS["zwrap"], CODEC_IDS["zstd"]):
        inner_codec += "+z"
    meta = json.dumps(
        {
            "codec": inner_codec,
            "n_docs": len(lengths),
            "n_tokens": len(values),
            "raw_bytes": raw_bytes,
            "comp_bytes": comp_bytes,
            "encode_s": round(time.perf_counter() - t0 + t_acc, 6),
            "checksum": checksum,
            # the selector's inputs (north star: cardinality / run-length /
            # value-range driven choice) — auditable per partition
            "n_distinct": tok_stats["n_distinct"],
            "n_runs": tok_stats["n_runs"],
            "vmin": tok_stats["vmin"],
            "vmax": tok_stats["vmax"],
        }
    )
    return {
        "part_id": part_id,
        "tokens_blob": tokens_blob,
        "lengths_blob": lengths_blob,
        "docids_blob": docids_blob,
        "sources_blob": sources_blob,
        "meta": meta,
    }


def _encode_arrow_partition(batches):
    """mapInArrow kernel: one physical partition → one blob row per part_id.

    After ``repartition(n_parts, part_id)`` every logical partition lives
    entirely in one physical partition (a physical partition may carry a
    few part_ids on hash collision).  Working on Arrow batches directly —
    ``ListArray.flatten()`` is a zero-copy view of the token values,
    ``take`` and ``list_value_length`` are C++ kernels — avoids the
    grouped-map path's per-key sort and per-row pandas materialization
    entirely; Python only ever touches whole columns.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    acc: dict[int, dict] = {}
    t0 = time.perf_counter()
    for b in batches:
        pids = b.column("part_id").to_numpy(zero_copy_only=False)
        if len(pids) == 0:
            continue
        for p in np.unique(pids):
            idx = pa.array(np.flatnonzero(pids == p))
            toks = b.column("tokens").take(idx)
            a = acc.setdefault(
                int(p), {"vals": [], "lens": [], "ids": [], "srcs": []}
            )
            a["vals"].append(
                toks.flatten().to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )
            )
            a["lens"].append(
                pc.list_value_length(toks)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            a["ids"].extend(b.column("doc_id").take(idx).to_pylist())
            a["srcs"].extend(b.column("source").take(idx).to_pylist())
    t_acc = time.perf_counter() - t0

    schema = pa.schema(
        [
            ("part_id", pa.int32()),
            ("tokens_blob", pa.binary()),
            ("lengths_blob", pa.binary()),
            ("docids_blob", pa.binary()),
            ("sources_blob", pa.binary()),
            ("meta", pa.string()),
        ]
    )
    share = t_acc / len(acc) if acc else 0.0
    for p, a in acc.items():
        values = (
            np.concatenate(a["vals"]) if a["vals"] else np.zeros(0, np.int64)
        )
        lengths = (
            np.concatenate(a["lens"]) if a["lens"] else np.zeros(0, np.int64)
        )
        row = _encode_blob_row(p, values, lengths, a["ids"], a["srcs"], share)
        yield pa.RecordBatch.from_pydict(
            {k: [v] for k, v in row.items()}, schema=schema
        )


def _append_plan_rows(
    spark, run_id: str, snapshot_id: str, plan_rows: list, out_dir: str
) -> None:
    """Persist the (source → offset/salts) plan beside the manifest.

    Driver-side pyarrow for filesystem paths — the rows are
    metadata-sized and a Spark write job costs ~1 s of fixed overhead
    per encode run; remote URIs (s3a:// etc.) go through a Spark write.
    Both paths emit the identical schema (int32 offset/salts) so mixed
    stores read back without a merge conflict.

    The local file is named by SNAPSHOT (the plan is a pure function of
    snapshot + plan params), so re-runs and resumed no-op runs overwrite
    with identical content instead of accumulating duplicates — which is
    also what lets the fully-resumed path backfill plans for stores
    encoded before this feature existed.  (The remote branch appends a
    part file per run instead; ``candidate_parts`` reads the plan
    through ``.distinct()``, so duplicates only cost bytes.)
    """
    ppath = plan_path(out_dir)
    if "://" not in ppath or ppath.startswith("file:"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        local = ppath[len("file:"):] if ppath.startswith("file:") else ppath
        os.makedirs(local, exist_ok=True)
        tbl = pa.table(
            {
                "run_id": pa.array([run_id] * len(plan_rows), pa.string()),
                "snapshot_id": pa.array(
                    [snapshot_id] * len(plan_rows), pa.string()
                ),
                "source": pa.array([s for s, _, _ in plan_rows], pa.string()),
                "offset": pa.array([o for _, o, _ in plan_rows], pa.int32()),
                "salts": pa.array([k for _, _, k in plan_rows], pa.int32()),
            }
        )
        pq.write_table(
            tbl, os.path.join(local, f"plan-{snapshot_id}.parquet")
        )
        return
    spark.createDataFrame(
        [(run_id, snapshot_id, s, o, k) for s, o, k in plan_rows],
        "run_id string, snapshot_id string, source string, "
        "offset int, salts int",
    ).coalesce(1).write.mode("append").parquet(ppath)


def encode_sink_frame(
    pending: DataFrame, n_parts: int, run_id: str
) -> DataFrame:
    """The blob frame exactly as the sink writes it — ONE shuffle total.

    Explicit repartition by part_id (the user-specified partition count
    suppresses AQE coalescing — every encode slot stays busy), then a
    streaming Arrow kernel; no per-key sort, no pandas rows.  The sink
    rides the encode stage's own tasks — one parquet file per non-empty
    encode task — so the COMPRESSED bytes never cross a second shuffle.
    Earlier rounds repacked to ~n_parts/16 files here
    (``.repartition(n_files)`` between the kernel and the sink); at
    100 TB that second exchange moves every compressed byte through the
    network once more purely for file-count hygiene, which
    ``compact_store`` already owns (it re-encodes the union into
    full-size partitions AND collapses the file count).  Cost accepted:
    ~n_parts files per run instead of ~n_parts/16 — footer overhead is
    per-file ~KB against ~MB blob rows, and manifest derivation lists
    only this run's directory.  Guarded by
    ``test_encode_sink_has_no_repack_exchange``.
    """
    return (
        pending.repartition(n_parts, F.col("part_id"))
        .mapInArrow(_encode_arrow_partition, ENCODED_SCHEMA)
        .withColumn("run_id", F.lit(run_id))
    )


def encode_token_table(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    target_tokens: int = DEFAULT_TARGET_TOKENS,
    by_source: bool = True,
    resume: bool = True,
    run_id: str | None = None,
    snapshot_salt: str | None = None,
) -> dict:
    """Encode a (doc_id, tokens, n_tok, source) table; returns run stats.

    ``snapshot_salt`` scopes the content-addressed snapshot id to a caller
    namespace (e.g. a streaming epoch): two DIFFERENT ingest batches whose
    content happens to be identical must land as two snapshots — without a
    salt the second would resume-skip against the first's manifest rows and
    silently vanish from ``decode(snapshots="all")``.  A REPLAY of the same
    batch passes the same salt and still dedupes exactly.
    """
    run_id = run_id or f"run_{uuid.uuid4().hex[:12]}"
    if not 0 < target_tokens <= 2**31 - 1:
        raise ValueError(
            f"target_tokens={target_tokens} out of range (1 .. 2^31-1): "
            "decode materializes int32 Arrow list offsets per partition"
        )
    shares, data_snapshot = input_stats(df)
    planned, n_parts, plan_rows = plan_partitions(
        df, target_tokens, by_source, shares
    )
    # The manifest key is (data fingerprint + plan parameters): part_ids are
    # only comparable across runs when target_tokens/by_source match, so a
    # re-run of the same data under a coarser/finer plan must NOT resume
    # against (or union with) the old plan's partitions.
    snapshot_id = f"{data_snapshot}-tt{target_tokens}{'s' if by_source else 'g'}"
    if snapshot_salt is not None:
        snapshot_id = f"{snapshot_id}-{snapshot_salt}"

    # persist the doc→partition mapping up front (metadata-sized: one row
    # per source) so point lookups can target candidate partitions
    # (decode_job.lookup_docs).  Before the encode work AND on the
    # fully-resumed path below, so a crash-and-resume can never leave a
    # committed manifest without its plan, and stores encoded before
    # this feature backfill on their next (even no-op) run.  Idempotent:
    # the file is keyed by snapshot id.
    if n_parts > 0:
        _append_plan_rows(spark, run_id, snapshot_id, plan_rows, out_dir)

    done_ids: set[int] = set()
    pending = planned
    if resume:
        done = completed_parts(spark, out_dir, snapshot_id)
        if done is not None:
            # metadata-sized (O(parts)); the id set also feeds the
            # empty-partition backfill below
            done_ids = {r["part_id"] for r in done.collect()}
            pending = planned.join(F.broadcast(done), "part_id", "left_anti")
    skipped = len(done_ids)

    # same snapshot id ⇒ same data AND same plan parameters ⇒ same plan, so
    # "all planned parts already in the manifest" decides completion without
    # evaluating `pending` (an isEmpty() here would cost an extra pass over
    # the input)
    if skipped >= n_parts:
        return {
            "run_id": run_id,
            "snapshot_id": snapshot_id,
            "n_parts_planned": n_parts,
            "n_parts_skipped_resume": skipped,
            "n_parts_encoded": 0,
            "n_docs": 0,
            "n_tokens": 0,
            "raw_bytes": 0,
            "comp_bytes": 0,
            "encode_cpu_s": 0.0,
        }

    # in-flight marker BEFORE any blob bytes move: a concurrent/later
    # vacuum sees this run as running-until-committed and refuses to
    # reclaim its blob directory (maintenance.vacuum_store's guard)
    append_running_marker(spark, out_dir, run_id, snapshot_id)

    (
        encode_sink_frame(pending, n_parts, run_id)
        .write.mode("append")
        .option("compression", "none")
        .partitionBy("run_id")
        .parquet(blobs_path(out_dir))
    )

    # derive manifest rows from the blobs just written (single encode pass —
    # no recompute, no cache): read ONLY this run's blob directory — a
    # whole-tree read would re-list every historical run's files (O(store)
    # metadata I/O per encode on an object store) just to filter them out
    # one small row per partition (meta column only — parquet column
    # pruning skips the blob bytes); cached because both the manifest
    # write and the totals aggregation consume it
    try:
        written = (
            spark.read.parquet(f"{blobs_path(out_dir)}/run_id={run_id}")
            .select("part_id", F.from_json("meta", META_SCHEMA).alias("m"))
            .select("part_id", "m.*")
            .cache()
        )
        written.count()
    except AnalysisException as e:
        # A run whose pending parts were ALL empty writes no blob rows, so
        # its run_id= directory never materializes — and ONLY that case may
        # take the empty fallback.  Any other failure (transient FS error,
        # corrupt footer, executor death) must re-raise: swallowing it here
        # would let the empty-partition backfill below durably commit
        # status='ok' codec='empty' manifest rows for partitions that DO
        # hold data — silent loss that resume then treats as complete.
        if (e.getCondition() or "") != "PATH_NOT_FOUND":
            raise
        written = spark.createDataFrame(
            [], f"part_id int, {META_SCHEMA}"
        ).cache()
    manifest_rows = written.select(
        F.lit(run_id).alias("run_id"),
        F.lit(snapshot_id).alias("snapshot_id"),
        "part_id",
        "codec",
        "n_docs",
        "n_tokens",
        "raw_bytes",
        "comp_bytes",
        "encode_s",
        "checksum",
        "n_distinct",
        "n_runs",
        "vmin",
        "vmax",
        F.lit("ok").alias("status"),
        F.current_timestamp().alias("finished_at"),
    )
    append_manifest(manifest_rows, out_dir)

    # A planned partition can legitimately receive ZERO docs (a salted hot
    # source whose few doc-id hashes don't cover every salt bucket).  The
    # kernel yields no blob row for it, so without a manifest row resume
    # would re-plan it forever: skipped < n_parts on every re-run, each
    # appending a new running marker that never commits — permanently
    # blocking vacuum/compact.  Commit empty partitions as zero-row ok
    # facts instead (no blob; decode's inner join to blobs skips them).
    written_ids = {r["part_id"] for r in written.select("part_id").collect()}
    empty_ids = sorted(set(range(n_parts)) - done_ids - written_ids)
    if empty_ids:
        empties = spark.createDataFrame(
            [(p,) for p in empty_ids], "part_id int"
        ).select(
            F.lit(run_id).alias("run_id"),
            F.lit(snapshot_id).alias("snapshot_id"),
            "part_id",
            F.lit("empty").alias("codec"),
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("raw_bytes"),
            F.lit(0).cast("long").alias("comp_bytes"),
            F.lit(0.0).alias("encode_s"),
            F.lit(0).cast("long").alias("checksum"),
            *[
                F.lit(None).cast("long").alias(c)
                for c in ("n_distinct", "n_runs", "vmin", "vmax")
            ],
            F.lit("ok").alias("status"),
            F.current_timestamp().alias("finished_at"),
        )
        append_manifest(empties, out_dir)

    agg = written.agg(
        F.count("*").alias("parts"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("raw_bytes").alias("raw"),
        F.sum("comp_bytes").alias("comp"),
        F.sum("encode_s").alias("cpu_s"),
    ).first()
    written.unpersist()
    return {
        "run_id": run_id,
        "snapshot_id": snapshot_id,
        "n_parts_planned": n_parts,
        "n_parts_skipped_resume": skipped,
        "n_parts_empty": len(empty_ids),
        "n_parts_encoded": agg["parts"] or 0,
        "n_docs": agg["docs"] or 0,
        "n_tokens": agg["tokens"] or 0,
        "raw_bytes": agg["raw"] or 0,
        "comp_bytes": agg["comp"] or 0,
        "encode_cpu_s": agg["cpu_s"] or 0.0,
    }
