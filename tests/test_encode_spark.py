"""E2E Spark tests: encode → manifest → decode → bit-identical verify.

The north-rule invariant (token-array equality) plus resumability and
skew-aware partition planning, on deterministic inputs (seed fixed —
mirrors the reference's seeded-dataset E2E, SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_sql_duckdb_parquet__spark.encode import (
    decode_token_table,
    encode_token_table,
    plan_partitions,
    read_manifest,
    synth_token_table,
    tokenize_documents,
    verify_roundtrip,
)


@pytest.fixture(scope="module")
def token_df(spark, sf_dir):
    df = tokenize_documents(spark, sf_dir)
    df.cache().count()
    return df


def test_tokenizer_shape_and_determinism(spark, token_df):
    row = token_df.first()
    assert row["doc_id"].startswith("doc_")
    assert row["n_tok"] == len(row["tokens"])
    assert all(0 <= t < 50257 for t in row["tokens"][:50])
    # deterministic: re-derivation produces identical arrays
    again = tokenize_documents(spark, "/root/testdata/sf0.001")
    v = verify_roundtrip(token_df, again)
    assert v["ok"], v


def test_plan_partitions_source_salted(spark, token_df):
    target = 5_000
    planned, n_parts, _ = plan_partitions(token_df, target_tokens=target)
    assert n_parts >= 2
    per_part = (
        planned.groupBy("part_id")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    )
    # skew bounded: no partition more than 2× the target (packed bins stay
    # under target + one small source; salted hot sources under target + ε)
    assert max(r["tok"] for r in per_part) < 2 * target
    # every partition id within range, no gaps beyond plan
    assert all(0 <= r["part_id"] < n_parts for r in per_part)
    # a hot source (> target tokens) is split across multiple partitions
    hot = (
        planned.groupBy("source")
        .agg(F.sum("n_tok").alias("tok"), F.countDistinct("part_id").alias("np"))
        .collect()
    )
    for r in hot:
        if r["tok"] >= target:
            assert r["np"] > 1, f"hot source {r['source']} not salted"


def test_encode_decode_roundtrip(spark, token_df, tmp_path):
    out = str(tmp_path / "enc")
    stats = encode_token_table(spark, token_df, out, target_tokens=100_000)
    assert stats["n_parts_encoded"] == stats["n_parts_planned"]
    assert stats["n_docs"] == token_df.count()
    assert 0 < stats["comp_bytes"] < stats["raw_bytes"]

    decoded = decode_token_table(spark, out)
    v = verify_roundtrip(token_df, decoded)
    assert v["ok"], v

    m = read_manifest(spark, out)
    rows = m.filter(m.status == "ok").collect()
    assert len(rows) == stats["n_parts_planned"]
    assert all(r["codec"] for r in rows)
    # plus exactly one run-level in-flight marker for the committed run
    markers = m.filter(m.status == "running").collect()
    assert [r["run_id"] for r in markers] == [stats["run_id"]]


def test_encode_empty_and_zero_length_docs(spark, tmp_path):
    """Degenerate inputs: a 0-row table must no-op cleanly (0 planned
    partitions), and docs with empty token arrays must roundtrip
    bit-identical alongside non-empty ones."""
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    empty = spark.createDataFrame([], schema)
    out0 = str(tmp_path / "enc_empty")
    stats = encode_token_table(spark, empty, out0, target_tokens=10_000)
    assert stats["n_parts_planned"] == 0 and stats["n_docs"] == 0

    rows = [("d1", [], 0, "a"), ("d2", [1, 2, 3], 3, "a"), ("d3", [], 0, "b")]
    df = spark.createDataFrame(rows, schema)
    out1 = str(tmp_path / "enc_zlen")
    encode_token_table(spark, df, out1, target_tokens=10_000)
    v = verify_roundtrip(df, decode_token_table(spark, out1))
    assert v["ok"] and v["n_union"] == 3, v


def test_encode_rejects_null_inputs(spark, tmp_path):
    """NULL source/doc_id/tokens must fail fast: a null source would
    silently vanish through the plan equi-join (while the snapshot
    fingerprint counts it), and a null tokens array would commit a corrupt
    INT64_MIN length to the store."""
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    cases = [
        ("null source", [("d1", [1], 1, None), ("d2", [2], 1, "a")]),
        ("null doc_id", [(None, [1], 1, "a"), ("d2", [2], 1, "a")]),
        ("null tokens", [("d1", None, 1, "a"), ("d2", [2], 1, "a")]),
        ("null n_tok", [("d1", [1], None, "a"), ("d2", [2], 1, "a")]),
    ]
    for name, rows in cases:
        df = spark.createDataFrame(rows, schema)
        with pytest.raises(ValueError, match="NULL"):
            encode_token_table(
                spark, df, str(tmp_path / "enc_null"), target_tokens=10_000
            )
        assert name  # labels the failing case in tracebacks


def test_encode_rejects_absurd_target_tokens(spark, tmp_path):
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    df = spark.createDataFrame([("d1", [1], 1, "a")], schema)
    for bad in (0, -5, 2**31):
        with pytest.raises(ValueError, match="target_tokens"):
            encode_token_table(
                spark, df, str(tmp_path / "enc_tt"), target_tokens=bad
            )


def test_empty_planned_partition_converges_on_resume(spark, tmp_path):
    """A salted hot source with fewer docs than salt buckets leaves a
    planned partition with ZERO docs; it must still land in the manifest
    (codec='empty') so resume converges to a no-op instead of re-planning
    forever — each phantom re-run would append a running marker that
    never commits, permanently blocking vacuum/compact."""
    from etl_sql_duckdb_parquet__spark.encode.maintenance import (
        vacuum_store,
    )

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    # 2 docs, 1200 tokens, target 1000 → salts=2; both doc-id hashes may
    # land in one bucket; brute-force doc ids until they DO collide so the
    # test is deterministic
    from pyspark.sql import functions as SF

    ids = None
    for i in range(200):
        cand = [f"x{i}_a", f"x{i}_b"]
        buckets = {
            r["b"]
            for r in spark.createDataFrame(
                [(c,) for c in cand], "doc_id string"
            )
            .select(SF.pmod(SF.xxhash64("doc_id"), SF.lit(2)).alias("b"))
            .collect()
        }
        if buckets == {0} or buckets == {1}:
            ids = cand
            break
    assert ids is not None
    df = spark.createDataFrame(
        [(ids[0], list(range(600)), 600, "hot"),
         (ids[1], list(range(600)), 600, "hot")],
        schema,
    )
    out = str(tmp_path / "enc_emptypart")
    s1 = encode_token_table(spark, df, out, target_tokens=1_000)
    assert s1["n_parts_planned"] == 2
    assert s1["n_parts_encoded"] == 1 and s1["n_parts_empty"] == 1
    # resume is a true no-op: nothing pending, no new marker appended
    s2 = encode_token_table(spark, df, out, target_tokens=1_000)
    assert s2["n_parts_skipped_resume"] == 2 and s2["n_parts_encoded"] == 0
    # and the store is vacuum-able (no permanently-uncommitted markers)
    vacuum_store(spark, out)
    v = verify_roundtrip(df, decode_token_table(spark, out))
    assert v["ok"] and v["n_union"] == 2, v


def test_decode_column_projection(spark, token_df, tmp_path):
    """Projected decode must match the full decode's projection, and the
    blob scan must prune the token blobs (each logical column lives in its
    own blob — the format's columnar payoff)."""
    out = str(tmp_path / "enc_proj")
    encode_token_table(spark, token_df, out, target_tokens=100_000)

    proj = decode_token_table(spark, out, columns=["doc_id", "n_tok"])
    assert proj.columns == ["doc_id", "n_tok"]
    full = decode_token_table(spark, out).select("doc_id", "n_tok")
    assert sorted(proj.collect()) == sorted(full.collect())

    # parquet column pruning: the scan's ReadSchema must not include the
    # token blob bytes
    plan = proj.sparkSession._jvm.PythonSQLUtils.explainString(
        proj._jdf.queryExecution(), "formatted"
    )
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("tokens_blob" not in ln for ln in read_schema)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown decode columns"):
        decode_token_table(spark, out, columns=["nope"])


def test_resume_skips_completed_partitions(spark, token_df, tmp_path):
    out = str(tmp_path / "enc_resume")
    first = encode_token_table(spark, token_df, out, target_tokens=100_000)
    assert first["n_parts_skipped_resume"] == 0
    second = encode_token_table(spark, token_df, out, target_tokens=100_000)
    assert second["n_parts_skipped_resume"] == first["n_parts_planned"]
    assert second["n_parts_encoded"] == 0
    # decode still verifies after the no-op rerun (no duplicate rows)
    v = verify_roundtrip(token_df, decode_token_table(spark, out))
    assert v["ok"], v


def test_resume_ignores_other_plan_params(spark, token_df, tmp_path):
    """Same data, different target_tokens => a DIFFERENT partition plan,
    whose part_ids are incomparable with the first run's.  Resume must not
    skip against the old plan, and decode (latest) must not union blobs
    across the two plans."""
    out = str(tmp_path / "enc_replan")
    encode_token_table(spark, token_df, out, target_tokens=100_000)
    second = encode_token_table(spark, token_df, out, target_tokens=5_000)
    assert second["n_parts_skipped_resume"] == 0
    assert second["n_parts_encoded"] == second["n_parts_planned"] > 1
    v = verify_roundtrip(token_df, decode_token_table(spark, out))
    assert v["ok"], v


def test_resume_after_partial_failure(spark, token_df, tmp_path):
    """Simulate a crashed run: encode only half the partitions, then resume."""
    out = str(tmp_path / "enc_partial")
    planned, n_parts, _ = plan_partitions(token_df, target_tokens=5_000)
    assert n_parts >= 4
    half = planned.filter(F.col("part_id") < n_parts // 2).drop("part_id")
    encode_token_table(spark, half, out, target_tokens=5_000)
    # full input, same snapshot semantics don't hold (different snapshot id),
    # so resume keys on snapshot: a changed input re-encodes everything
    stats = encode_token_table(spark, token_df, out, target_tokens=5_000)
    assert stats["n_parts_encoded"] == n_parts
    v = verify_roundtrip(token_df, decode_token_table(spark, out))
    assert v["ok"], v


def test_synth_table_roundtrip_with_skew(spark, tmp_path):
    df = synth_token_table(spark, 2000, avg_len=64, skew_source=True)
    df.cache().count()
    srcs = {r["source"] for r in df.select("source").distinct().collect()}
    assert srcs == {"web", "books", "code", "wiki"}
    out = str(tmp_path / "enc_synth")
    stats = encode_token_table(spark, df, out, target_tokens=20_000)
    assert stats["comp_bytes"] < stats["raw_bytes"]
    v = verify_roundtrip(df, decode_token_table(spark, out))
    assert v["ok"], v
    df.unpersist()


def test_compression_beats_reference_parquet_zstd(spark, tmp_path):
    """North rule: our compressed size ≤ reference method (Parquet/ZSTD).

    Gated at a non-degenerate size (~500k tokens); at sf0.001 (28k tokens)
    fixed parquet-footer overhead dominates both sides.
    """
    token_df = synth_token_table(spark, 2000, avg_len=256)
    token_df.cache().count()
    out = str(tmp_path / "enc_cmp")
    stats = encode_token_table(spark, token_df, out, target_tokens=200_000)
    ref = str(tmp_path / "ref_zstd")
    token_df.write.option("compression", "zstd").parquet(ref)
    import os

    ref_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(ref)
        for f in fs
        if not f.startswith(("_", "."))
    )
    blob_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(os.path.join(out, "blobs"))
        for f in fs
        if not f.startswith(("_", "."))
    )
    assert blob_bytes <= ref_bytes, (blob_bytes, ref_bytes)


def test_input_stats_single_pass_matches_snapshot_id(spark, token_df):
    """input_stats folds the snapshot fingerprint into the planning
    aggregate; it must equal the standalone manifest fingerprint."""
    from etl_sql_duckdb_parquet__spark.encode.encode_job import input_stats
    from etl_sql_duckdb_parquet__spark.encode.manifest import snapshot_id_of

    shares, snap = input_stats(token_df)
    assert snap == snapshot_id_of(token_df)
    assert sum(r["n"] for r in shares) == token_df.count()
    assert {r["source"] for r in shares} == {
        r["source"] for r in token_df.select("source").distinct().collect()
    }


def test_append_mode_decodes_all_snapshots(spark, tmp_path):
    """Append-only ingestion: each batch encoded as its own snapshot;
    decode(snapshots='all') concatenates, default decodes only the
    latest snapshot (no cross-snapshot partition mixing)."""
    out = str(tmp_path / "enc_append")
    a = synth_token_table(spark, 800, avg_len=32, seed=1)
    b = synth_token_table(spark, 600, avg_len=32, seed=2).withColumn(
        "doc_id", F.concat(F.lit("b_"), F.col("doc_id"))
    )
    encode_token_table(spark, a, out, target_tokens=5_000)
    encode_token_table(spark, b, out, target_tokens=5_000)

    latest = decode_token_table(spark, out)  # default: latest snapshot only
    v_latest = verify_roundtrip(b, latest)
    assert v_latest["ok"], v_latest

    both = decode_token_table(spark, out, snapshots="all")
    v_both = verify_roundtrip(a.unionByName(b), both)
    assert v_both["ok"], v_both


def test_manifest_records_selector_stats(spark, token_df, tmp_path):
    """Per-partition selector inputs (cardinality / runs / value range)
    land in the manifest for codec-choice auditability."""
    out = str(tmp_path / "enc_stats")
    encode_token_table(spark, token_df, out, target_tokens=10_000)
    m = read_manifest(spark, out)
    rows = m.filter(m.status == "ok").collect()
    for r in rows:
        assert r["n_distinct"] > 0
        assert r["n_runs"] > 0
        assert 0 <= r["vmin"] <= r["vmax"] < 50257


def test_encoded_source_stats_salts_hot_source(spark):
    """The q50/q52 showcase path must reuse the encode job's token-mass
    salting (round-2 weak finding: one applyInPandas group per source
    melts an executor on a hot source).  A skewed synthetic source must
    split across >1 partition, and the merged per-source stats must still
    equal the unsalted totals."""
    from etl_sql_duckdb_parquet__spark.encode.synth import synth_token_table
    from etl_sql_duckdb_parquet__spark.queries.encode_queries import (
        encoded_source_stats,
    )

    toks = synth_token_table(spark, 2000, avg_len=64)  # ~70% one hot source
    rows = encoded_source_stats(toks, target_tokens=10_000).collect()
    hot = max(rows, key=lambda r: r["n_tokens"])
    assert hot["n_parts"] > 1
    by_src = {r["source"]: r for r in rows}
    totals = toks.groupBy("source").agg(
        F.sum("n_tok").alias("t"), F.count("*").alias("n")
    ).collect()
    assert set(by_src) == {r["source"] for r in totals}
    for r in totals:
        s = by_src[r["source"]]
        assert s["n_tokens"] == r["t"] and s["n_docs"] == r["n"]
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["comp_bytes"] < r["raw_bytes"] for r in rows)


def test_q50_codec_names_are_registered(spark):
    """The codec NAME is not oracle-expressible (xxhash-dependent), so the
    selector's choice is asserted here: every per-source codec must be a
    registered codec id and the driver-facing booleans must hold."""
    from etl_sql_duckdb_parquet__spark.codecs.core import CODEC_NAMES
    from etl_sql_duckdb_parquet__spark.queries.encode_queries import (
        encoded_source_stats,
    )

    toks = tokenize_documents(spark, "/root/testdata/sf0.001")
    rows = encoded_source_stats(toks).collect()
    names = set(CODEC_NAMES.values())
    assert rows
    for r in rows:
        assert r["codec"] in names
        assert r["comp_bytes"] < r["raw_bytes"]


def test_point_lookup_decodes_candidate_partitions_only(
    spark, token_df, tmp_path
):
    """lookup_docs must return exactly the requested docs (bit-identical
    to a full decode + filter) while touching only the partitions the
    persisted plan maps the ids to — at most sources-per-id, not the
    whole store."""
    from etl_sql_duckdb_parquet__spark.encode import (
        candidate_parts,
        lookup_docs,
    )

    out = str(tmp_path / "enc_lookup")
    # small target → many partitions, so candidate pruning is visible
    # (ids × sources candidates must be < the partition count)
    stats = encode_token_table(spark, token_df, out, target_tokens=200)
    n_parts = stats["n_parts_planned"]

    wanted = [r["doc_id"] for r in token_df.select("doc_id").limit(3).collect()]
    parts = candidate_parts(spark, out, wanted)
    n_sources = token_df.select("source").distinct().count()
    assert 0 < len(parts) <= len(wanted) * n_sources
    assert len(parts) < n_parts

    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in lookup_docs(spark, out, wanted).collect()
    }
    full = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in decode_token_table(spark, out)
        .filter(F.col("doc_id").isin(wanted))
        .collect()
    }
    assert got == full and set(got) == set(wanted)

    # column projection composes with the lookup
    slim = lookup_docs(spark, out, wanted, columns=["doc_id", "n_tok"])
    assert slim.columns == ["doc_id", "n_tok"] and slim.count() == len(wanted)

    # unknown ids return no rows (and don't error)
    assert lookup_docs(spark, out, ["no_such_doc"]).count() == 0

    # source-known lookup collapses candidates to one part per doc
    s_rows = (
        token_df.select("doc_id", "source").limit(2).collect()
    )
    src_name = s_rows[0]["source"]
    s_ids = [
        r["doc_id"] for r in token_df.filter(F.col("source") == src_name)
        .select("doc_id").limit(2).collect()
    ]
    s_parts = candidate_parts(spark, out, s_ids, source=src_name)
    assert 0 < len(s_parts) <= len(s_ids)
    s_got = lookup_docs(spark, out, s_ids, source=src_name)
    assert sorted(r["doc_id"] for r in s_got.collect()) == sorted(s_ids)


def test_cli_point_lookup(spark, token_df, tmp_path):
    """The spark-submit surface: `encode.cli --lookup-ids` fetches docs
    from an existing store via the plan-targeted path."""
    from etl_sql_duckdb_parquet__spark.encode.cli import main

    out = str(tmp_path / "enc_cli_lookup")
    encode_token_table(spark, token_df, out, target_tokens=500)
    picked = token_df.select("doc_id", "source").limit(2).collect()
    ids = [r["doc_id"] for r in picked]

    stats = main(["--out", out, "--lookup-ids", ",".join(ids)])
    assert stats["mode"] == "lookup"
    assert stats["n_found"] == stats["n_requested"] == 2
    assert {d["doc_id"] for d in stats["docs"]} == set(ids)
    assert stats["n_candidate_parts"] >= 1


def test_plan_backfill_on_resumed_noop(spark, token_df, tmp_path):
    """A store whose plan is missing (encoded before lookup support, or a
    crash between writes) must regain it from the next run — even a
    fully-resumed no-op — since the plan write precedes the resume
    early-return and is idempotent per snapshot."""
    import shutil

    from etl_sql_duckdb_parquet__spark.encode import candidate_parts

    out = str(tmp_path / "enc_backfill")
    encode_token_table(spark, token_df, out, target_tokens=5_000)
    shutil.rmtree(f"{out}/plan")
    with pytest.raises(FileNotFoundError, match="no partition plan"):
        candidate_parts(spark, out, ["doc_0"])

    stats = encode_token_table(spark, token_df, out, target_tokens=5_000)
    assert stats["n_parts_encoded"] == 0  # resume no-op...
    assert candidate_parts(spark, out, ["doc_0"])  # ...but plan is back
