"""Per-round benchmark (driver contract): headline workload at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``; prints ONE JSON line.

Headline = the north-star encode pipeline (tokenize → salted partition →
codec encode → manifest → decode-verify) measured in tokens/sec and
compression ratio vs the reference method (plain Parquet/ZSTD of the same
table, reference ``src/etl/load.py:44-48``), plus a representative slice
of the query suite.

The sf-dir document set is small, so throughput there is overhead-bound;
``synth_encode`` adds a fixed-size synthetic workload (seed-fixed,
~19M tokens) for a CPU-bound tokens/sec figure.  Scaling (local[8] vs
local[32]) is measured separately by ``tools/scaling_bench.py`` and
recorded in BASELINE.md.

Every timed section is BEST-OF-N (``$SPARK_GRAFT_BENCH_REPEATS``, default
2): this host's CPU varies 3-10x run-to-run (CLAUDE.md), so single-shot
round-over-round deltas are unreadable.  Encode repeats use a fresh output
dir each time (resume would no-op the second pass).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q04_segment_revenue",
    "q10_returnflag_summary",
    "q17_dedup_keep_latest",
    "q41_ngram_jaccard_pairs",
    "q42_minhash_lsh_pairs",
    "q45_cosine_topk",
    "q50_codec_selection",
]

SYNTH_DOCS = 75_000  # ~19M tokens at avg_len=256


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from etl_sql_duckdb_parquet__spark.encode.decode_job import (
        decode_token_table,
        verify_roundtrip,
    )
    from etl_sql_duckdb_parquet__spark.encode.encode_job import (
        encode_token_table,
    )
    from etl_sql_duckdb_parquet__spark.encode.synth import (
        synth_token_table,
        tokenize_documents,
    )
    from etl_sql_duckdb_parquet__spark.queries import REGISTRY
    from etl_sql_duckdb_parquet__spark.session import get_spark

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    spark = get_spark(cores=cores)
    queries: dict[str, float] = {}
    extra: dict[str, object] = {"repeats": repeats}

    # untimed warmup: small full-path encode so the timed sections measure
    # steady state (JIT, python workers, codegen), not session cold-start
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        encode_token_table(
            spark,
            synth_token_table(spark, 3000, avg_len=64),
            warm_dir,
            target_tokens=50_000,
            resume=False,
        )
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    # --- headline: encode pipeline on the sf-dir documents table
    work = tempfile.mkdtemp(prefix="bench_enc_")
    try:
        # materialize the tokenized input before timing: encode makes two
        # passes (stats + encode), and re-running the tokenizer inside the
        # timed region would measure generation, not the encode engine
        df = tokenize_documents(spark, sf_dir).cache()
        df.count()
        enc_s, dec_s = float("inf"), float("inf")
        for rep in range(repeats):
            rep_dir = os.path.join(work, f"rep{rep}")
            t0 = time.perf_counter()
            stats = encode_token_table(spark, df, rep_dir, resume=False)
            enc_s = min(enc_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            v = verify_roundtrip(df, decode_token_table(spark, rep_dir))
            dec_s = min(dec_s, time.perf_counter() - t0)
            if rep == 0:
                extra["decode_bit_identical"] = v["ok"]
                extra["sfdir_blob_bytes"] = dir_bytes(
                    os.path.join(rep_dir, "blobs")
                )
            else:
                extra["decode_bit_identical"] = (
                    extra["decode_bit_identical"] and v["ok"]
                )
        queries["encode_sfdir"] = round(enc_s, 3)
        queries["decode_verify_sfdir"] = round(dec_s, 3)
        extra["sfdir_tokens"] = stats["n_tokens"]
        extra["sfdir_tokens_per_s"] = round(stats["n_tokens"] / enc_s, 1)
        extra["sfdir_compression_ratio"] = round(
            stats["raw_bytes"] / stats["comp_bytes"], 4
        )
        ref_dir = os.path.join(work, "ref_zstd")
        df.write.mode("overwrite").option("compression", "zstd").parquet(ref_dir)
        extra["sfdir_reference_zstd_bytes"] = dir_bytes(ref_dir)
        extra["sfdir_size_vs_reference"] = round(
            extra["sfdir_blob_bytes"] / extra["sfdir_reference_zstd_bytes"], 4
        )
        df.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- headline: CPU-bound synthetic encode (fixed size, seed-fixed)
    work = tempfile.mkdtemp(prefix="bench_synth_")
    try:
        sdf = synth_token_table(spark, SYNTH_DOCS).cache()
        sdf.count()
        enc_s = float("inf")
        for rep in range(repeats):
            rep_dir = os.path.join(work, f"rep{rep}")
            t0 = time.perf_counter()
            stats = encode_token_table(spark, sdf, rep_dir, resume=False)
            enc_s = min(enc_s, time.perf_counter() - t0)
        queries["encode_synth"] = round(enc_s, 3)
        extra["synth_tokens"] = stats["n_tokens"]
        extra["synth_tokens_per_s"] = round(stats["n_tokens"] / enc_s, 1)
        extra["synth_compression_ratio"] = round(
            stats["raw_bytes"] / stats["comp_bytes"], 4
        )
        sdf.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- representative query-suite slice (best-of-N each)
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            REGISTRY[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        queries[name] = round(best, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "encode+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cores": cores,
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
