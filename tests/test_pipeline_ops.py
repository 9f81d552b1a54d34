"""Behavioral tests for the approximate training-data-pipeline operators
(the ones the driver can only rows-only check): MinHash-LSH recall vs
exact Jaccard, SimHash self-consistency, LSH-ANN recall vs brute force,
multimodal metadata parity with the raw bytes.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sql_duckdb_parquet__spark.queries.dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    q41_ngram_jaccard_pairs,
    q42_minhash_lsh_pairs,
    q43_simhash_pairs,
)
from etl_sql_duckdb_parquet__spark.queries.multimodal import (  # noqa: E402
    q47_media_metadata,
)
from etl_sql_duckdb_parquet__spark.queries.similarity import (  # noqa: E402
    NEARDUP_COS,
    _lsh_bucketed,
    _vectors,
    q45_cosine_topk,
    q46_ann_lsh_topk,
    q55_embedding_neardup,
    q63_lsh_bucket_histogram,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def test_minhash_pairs_subset_of_exact(spark):
    """Every LSH-verified pair must appear in the exact Jaccard answer
    (verification step guarantees precision=1 vs the same threshold)."""
    exact = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in q41_ngram_jaccard_pairs(spark, SF_DIR).collect()
        if r["jaccard"] >= JACCARD_THRESHOLD
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in q42_minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9


def test_simhash_identical_docs_collide(spark):
    """Exact duplicates (if any) must have Hamming distance 0; pair list
    is symmetric-free (a_id < b_id) and within the distance bound."""
    rows = q43_simhash_pairs(spark, SF_DIR).collect()
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert 0 <= r["hamming"] <= 8


def test_ann_lsh_recall_vs_brute_force(spark):
    """Bucketed ANN top-5 should recover a reasonable fraction of the true
    top-5 (8 tables × 4 planes ⇒ measured recall ≈ 0.66 on sf0.01)."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in q45_cosine_topk(spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in q46_ann_lsh_topk(spark, SF_DIR).collect()
    }
    assert len(truth) == 50
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.4, f"ANN recall {recall} suspiciously low"
    # approximate results must still be real vectors, ranked 1..<=5 per query
    assert all(q < 10 for q, _ in approx)


def test_lsh_bucket_twin_matches_production_kernel(spark):
    """The oracle-checkable sequential-fold twin (q63) and the production
    tensordot kernel (q46/q55's `_lsh_bucketed`) must assign identical
    bucket populations on the test data — the accumulation orders differ
    only at the ulp level and no plane dot sits on a sign boundary here,
    so the candidate-generation structure the ANN queries rely on is
    exactly the structure the oracle verified."""
    twin = {
        (r["table_idx"], r["bucket"]): r["n_vectors"]
        for r in q63_lsh_bucket_histogram(spark, SF_DIR).collect()
    }
    prod = {
        (r["table_idx"], r["bucket"]): r["n"]
        for r in _lsh_bucketed(_vectors(spark, SF_DIR))
        .groupBy("table_idx", "bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert twin == prod


def test_embedding_neardup_precision_and_recall(spark):
    """q55: every reported pair must truly clear τ (precision 1.0 by
    construction — candidates are exact-verified), and LSH recall vs the
    brute-force pair set must hold (measured ≈0.83 on sf0.01 at τ=0.4)."""
    import numpy as np

    got = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in q55_embedding_neardup(spark, SF_DIR).collect()
    }
    # brute-force truth, numpy (same doubles as the JVM expression)
    rows = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = u @ u.T
    iu, ju = np.triu_indices(len(u), 1)
    keep = cos[iu, ju] >= NEARDUP_COS - 1e-9
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(iu[keep], ju[keep])
    }
    assert truth, "test data must contain near-dup pairs at this τ"
    # precision: reported pairs are a subset of the true pair set
    # (1e-6 slack: numpy matmul may reassociate vs the JVM fold)
    near_truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(iu, ju)
        if cos[i, j] >= NEARDUP_COS - 1e-6
    }
    assert set(got) <= near_truth
    recall = len(set(got) & truth) / len(truth)
    assert recall >= 0.6, f"near-dup recall {recall} below floor"


def test_media_metadata_matches_bytes(spark):
    import hashlib

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    texts = {r["doc_id"]: r["text"] for r in docs}
    meta = q47_media_metadata(spark, SF_DIR).collect()
    assert len(meta) == len(texts)
    for r in meta:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["sha"] == hashlib.sha256(raw).hexdigest()
        assert r["width"] == 16 + len(raw) % 240


def test_sql_entry_point_over_views(spark):
    """Free-form SQL over registered views (reference `cli query` path)."""
    from etl_sql_duckdb_parquet__spark.queries.common import register_views

    register_views(spark, SF_DIR)
    rows = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    ).collect()
    assert len(rows) == 5 and all(r["n"] > 0 for r in rows)


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF ANN with the √n spherical-k-means quantizer (multi-assignment
    R=2, probe n_cells/3) — measured recall ≈0.86 on sf0.01; the floor
    guards the ≥0.7 target on these weakly-clustered synthetic vectors."""
    from etl_sql_duckdb_parquet__spark.queries.similarity import (
        q54_ann_ivf_topk,
    )

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in q45_cosine_topk(spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in q54_ann_ivf_topk(spark, SF_DIR).collect()
    }
    assert len(approx) == 50
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.7, f"IVF recall {recall} below floor"


def test_asof_join_edge_semantics(spark):
    """The asof_join helper: inclusive <= match at equal timestamps,
    latest-prior selection, and null right columns when no match."""
    from datetime import datetime

    from etl_sql_duckdb_parquet__spark.queries.asof import asof_join

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 1, 0, 0)
    t2 = datetime(2024, 1, 1, 2, 0, 0)
    left = spark.createDataFrame(
        [
            (1, t1, "match-equal"),      # right row exactly at t1 → inclusive
            (1, t2, "match-latest"),     # two prior rows → the later one wins
            (2, t0, "no-match"),         # right rows only at later times
            (3, t2, "null-field"),       # matched row carries its NULL field
        ],
        "k int, ts timestamp_ntz, label string",
    )
    right = spark.createDataFrame(
        [
            (1, t0, 100),
            (1, t1, 200),
            (2, t2, 300),
            (3, t0, 400),
            (3, t1, None),
        ],
        "k int, rts timestamp_ntz, rv int",
    )
    out = {
        r["label"]: r
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts"
        ).collect()
    }
    assert out["match-equal"]["rv"] == 200 and out["match-equal"]["rts"] == t1
    assert out["match-latest"]["rv"] == 200
    assert out["no-match"]["rv"] is None and out["no-match"]["rts"] is None
    # row atomicity: the t1 match's NULL rv must not fall back to 400
    assert out["null-field"]["rts"] == t1 and out["null-field"]["rv"] is None
