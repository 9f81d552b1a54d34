"""Incremental (Structured Streaming) encode: files landing in two waves
must each be encoded exactly once, and append-mode decode of the
accumulated store must be bit-identical to the union of the inputs.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sql_duckdb_parquet__spark.encode.decode_job import (  # noqa: E402
    decode_token_table,
    verify_roundtrip,
)
from etl_sql_duckdb_parquet__spark.encode.synth import (  # noqa: E402
    synth_token_table,
)
from etl_sql_duckdb_parquet__spark.streaming import (  # noqa: E402
    run_available_now,
)


def _wave(spark, n_docs: int, seed: int, prefix: str):
    """A deterministic batch of docs with ids disjoint across seeds."""
    return synth_token_table(spark, n_docs, seed=seed).withColumn(
        "doc_id", F.concat(F.lit(prefix), F.col("doc_id"))
    )


def test_incremental_encode_two_waves_bit_identical(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "encoded")

    w1 = _wave(spark, 300, seed=1, prefix="w1_")
    w1.write.parquet(landing)  # wave 1 lands
    run_available_now(spark, landing, out, target_tokens=20_000)

    n_snapshots_after_w1 = (
        spark.read.parquet(os.path.join(out, "manifest"))
        .select("snapshot_id")
        .distinct()
        .count()
    )
    assert n_snapshots_after_w1 == 1

    w2 = _wave(spark, 200, seed=2, prefix="w2_")
    w2.write.mode("append").parquet(landing)  # wave 2 lands later
    run_available_now(spark, landing, out, target_tokens=20_000)

    # the second drain must only have consumed wave-2 files (streaming
    # checkpoint), producing exactly one more snapshot
    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    assert manifest.select("snapshot_id").distinct().count() == 2

    # append-mode decode == union of both waves, token arrays bit-identical
    decoded = decode_token_table(spark, out, snapshots="all")
    src = w1.unionByName(w2)
    report = verify_roundtrip(src, decoded)
    assert report["ok"], report
    assert report["n_union"] == 500


def test_content_identical_waves_are_distinct_snapshots(spark, tmp_path):
    """Two DIFFERENT micro-batches with identical content (legit duplicate
    shards landing twice) must BOTH encode: the snapshot id is epoch-
    scoped, so content-addressing alone can't resume-skip the second wave.
    decode(all) is then the exact union of the inputs, duplicates included.
    """
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "encoded")
    w = _wave(spark, 120, seed=7, prefix="dup_")

    w.write.parquet(landing)
    run_available_now(spark, landing, out, target_tokens=20_000)
    w.write.mode("append").parquet(landing)  # same content, new files
    run_available_now(spark, landing, out, target_tokens=20_000)

    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    assert manifest.select("snapshot_id").distinct().count() == 2

    decoded = decode_token_table(spark, out, snapshots="all")
    agg = decoded.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("s"),
    ).first()
    src = w.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("s"),
    ).first()
    assert agg["n"] == 2 * src["n"]
    assert agg["s"] == 2 * src["s"]


def test_streaming_cli_two_waves(spark, tmp_path):
    """The spark-submit surface: `encode.cli --stream-input-dir` drains a
    landing dir exactly-once per invocation and verifies decode(all)
    against the full landing contents."""
    from etl_sql_duckdb_parquet__spark.encode.cli import main

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "encoded")

    _wave(spark, 150, seed=11, prefix="c1_").write.parquet(landing)
    stats1 = main([
        "--stream-input-dir", landing, "--out", out,
        "--target-tokens", "20000", "--skip-reference",
    ])
    assert stats1["mode"] == "stream_available_now"
    assert stats1["verified_ok"], stats1

    _wave(spark, 100, seed=12, prefix="c2_").write.mode("append").parquet(
        landing
    )
    stats2 = main([
        "--stream-input-dir", landing, "--out", out,
        "--target-tokens", "20000", "--skip-reference",
    ])
    assert stats2["verified_ok"], stats2
    assert stats2["verify"]["n_union"] == 250

    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    assert manifest.select("snapshot_id").distinct().count() == 2


def test_incremental_encode_rerun_is_noop(spark, tmp_path):
    """Draining again with no new files must not add snapshots or blobs."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "encoded")
    _wave(spark, 150, seed=3, prefix="w3_").write.parquet(landing)

    run_available_now(spark, landing, out, target_tokens=20_000)
    manifest_path = os.path.join(out, "manifest")
    rows_before = spark.read.parquet(manifest_path).count()

    run_available_now(spark, landing, out, target_tokens=20_000)
    assert spark.read.parquet(manifest_path).count() == rows_before
