"""Similarity search over the ``embeddings`` table.

- q44/q45: brute-force cosine (exact baseline) — cross-join, dot product
  unrolled over the fixed dim entirely JVM-side (whole-stage codegen) in
  double precision so the DuckDB oracle (same fold order, same casts)
  matches bit-for-bit before rounding.
- q46: LSH-bucketed ANN (the scale path) — deterministic random-hyperplane
  signs bucket the vectors; only same-bucket pairs are scored.  At 10^9
  vectors the bucket join replaces the O(n²) cross-join; recall is traded
  via the number of hyperplanes.  Rows-only driver check; pytest measures
  recall against the brute-force top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import t

_DIM = 64
_N_TABLES = 8  # OR-amplification: candidate if ANY table buckets a pair together
_K_PLANES = 4  # AND within a table: k sign bits per bucket id
_SEED = 42

# Dot products / norms are UNROLLED over the fixed dim instead of
# aggregate(zip_with(...)): Catalyst evaluates higher-order-function
# lambdas interpreted (outside whole-stage codegen), which dominated the
# brute-force queries; the unrolled sum is pure codegen.  Bit-identity
# with the old fold (and the DuckDB oracle's list_dot_product, same
# left-to-right order) is preserved: the fold's seed step 0.0+x0 == x0
# and both shapes associate ((x0+x1)+x2)+... in IEEE doubles.
_DOT = " + ".join(f"va[{i}] * vb[{i}]" for i in range(_DIM))
_TO_DOUBLE = "CAST(embedding AS array<double>)"
_NORM = "sqrt(" + " + ".join(f"v[{i}] * v[{i}]" for i in range(_DIM)) + ")"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-dim contract: only ``_DIM``-length embeddings flow downstream.

    The unrolled ``_DOT``/``_NORM`` expressions index ``v[0.._DIM-1]``
    directly, and Spark 4 ANSI mode turns an out-of-range index into
    INVALID_ARRAY_INDEX — so a single malformed row would fail the whole
    query.  The size filter is a cheap codegen predicate that makes the
    contract explicit (malformed rows are dropped, not fatal)."""
    return (
        t(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") == _DIM)
        .select("vec_id", F.expr(_TO_DOUBLE).alias("v"))
        .withColumn("nrm", F.expr(_NORM))
    )


def _pair_cosine(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cross join with cosine; caller filters/limits."""
    aa = a.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    bb = b.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return aa.crossJoin(bb).select(
        "a_id",
        "b_id",
        (F.expr(_DOT) / (F.col("na") * F.col("nb"))).alias("cos"),
    )


def q44_top20_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar distinct pairs (brute force, exact)."""
    v = _vectors(spark, sf_dir)
    pairs = _pair_cosine(v, v).filter(F.col("a_id") < F.col("b_id"))
    return (
        pairs.select("a_id", "b_id", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "a_id", "b_id")
        .limit(20)
    )


def q45_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors for each of the first 10 vectors (brute force)."""
    v = _vectors(spark, sf_dir)
    queries = v.filter(F.col("vec_id") < 10)
    pairs = _pair_cosine(queries, v).filter(F.col("a_id") != F.col("b_id"))
    w = Window.partitionBy("a_id").orderBy(
        F.desc("cos"), F.asc("b_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("a_id").alias("query_id"),
            F.col("b_id").alias("neighbor_id"),
            F.col("rank"),
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


def lsh_plane_literals(
    dim: int = _DIM, n_tables: int = _N_TABLES, k_planes: int = _K_PLANES
) -> list:
    """Deterministic ±1 hyperplanes per table (seed-fixed, no runtime RNG)."""
    rng = np.random.RandomState(_SEED)
    return (
        rng.randint(0, 2, size=(n_tables, k_planes, dim)) * 2 - 1
    ).tolist()


def _lsh_bucket_udf():
    """Vectorized bucket-id kernel: one (n × dim) @ (dim × L·k) matmul per
    Arrow batch → L bucket ids per vector.

    A SQL-expression formulation of the 32 plane dots (even fully
    unrolled) puts ~64 multi-thousand-term expressions into the plan —
    Catalyst spends seconds ANALYZING the tree before any data moves.
    The numpy kernel keeps the plan tiny and is the right shape at 10^9
    vectors anyway (BLAS matmul, one pass)."""
    planes = np.asarray(lsh_plane_literals(), dtype=np.float64)  # (L,k,dim)
    weights = (1 << np.arange(planes.shape[1])).astype(np.int64)  # (k,)

    @F.pandas_udf("array<int>")
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # np.stack raises on an empty batch
            return pd.Series([], dtype=object)
        m = np.stack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        # (n, L, k) sign bits via one tensordot over dim
        bits = np.tensordot(m, planes, axes=([1], [2])) >= 0.0
        ids = (bits * weights).sum(axis=2).astype(np.int32)  # (n, L)
        return pd.Series(list(ids))

    return _buckets


def _lsh_bucketed(v: DataFrame) -> DataFrame:
    """Explode each vector into its (table_idx, bucket) LSH cells.

    L hash tables (OR) of k sign-bit planes (AND) — the standard
    recall/cost amplification shared by the ANN top-k (q46) and the
    embedding near-dup pass (q55).  Bucket ids come from one vectorized
    Arrow kernel (see :func:`_lsh_bucket_udf`)."""
    buckets = _lsh_bucket_udf()
    return v.select(
        "vec_id",
        "v",
        "nrm",
        F.posexplode(buckets(F.col("v"))).alias("table_idx", "bucket"),
    )


def q46_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 neighbors for the first 10 vectors.

    L hash tables (OR) of k sign-bit planes (AND): a pair is a candidate
    if any table puts both vectors in the same bucket — the standard
    recall/cost amplification.  At 10^9 vectors the per-table bucket join
    replaces the O(n²) cross-join; L and k tune recall vs candidates.
    Rows-only driver check (approximate by construction); pytest measures
    recall against the brute-force top-k.
    """
    bucketed = _lsh_bucketed(_vectors(spark, sf_dir))
    qa = bucketed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "table_idx",
        "bucket",
    )
    cb = bucketed.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "table_idx",
        "bucket",
    )
    pairs = (
        qa.join(cb, ["table_idx", "bucket"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", "va", "vb", "na", "nb")
        .dropDuplicates(["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            (F.expr(_DOT) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("b_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("a_id").alias("query_id"),
            F.col("b_id").alias("neighbor_id"),
            F.col("rank"),
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


def _lsh_bucket_seq_udf():
    """Bucket-id kernel with SEQUENTIAL (left-to-right) dot accumulation.

    Same planes as :func:`_lsh_bucket_udf`, but each plane dot is the last
    element of ``np.cumsum`` over the signed values — the exact IEEE
    association of DuckDB's ``list_dot_product`` fold, so the bucket ids
    (sign decisions included) are reproducible in the oracle bit-for-bit.
    The production tensordot kernel trades that association for BLAS
    speed; this twin exists to make the bucket structure value-checkable.
    """
    planes = np.asarray(lsh_plane_literals(), dtype=np.float64)  # (L,k,dim)
    n_tables, k_planes, dim = planes.shape
    flat = planes.reshape(n_tables * k_planes, dim)  # (L*k, dim)
    weights = (1 << np.arange(k_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        # (n, L*k, dim) signed terms → sequential fold along dim
        signed = m[:, None, :] * flat[None, :, :]
        dots = np.cumsum(signed, axis=2)[:, :, -1]
        bits = dots.reshape(len(m), n_tables, k_planes) >= 0.0
        ids = (bits * weights).sum(axis=2).astype(np.int32)
        return pd.Series(list(ids))

    return _buckets


def q63_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable LSH twin: per-(table, bucket) population histogram.

    q46/q55's production bucket kernel is not SQL-expressible (tensordot
    accumulation order), so — the q56 trick — this twin recomputes the
    SAME deterministic sign-plane bucket ids with a sequential-fold Arrow
    kernel (see :func:`_lsh_bucket_seq_udf`) whose IEEE association
    matches DuckDB's ``list_dot_product`` fold bit-for-bit, making the
    full bucket-population distribution (the candidate-generation
    structure the ANN/near-dup queries rely on) value-checkable against
    the oracle.  Plan shape at 10^9 vectors: one scan, one vectorized
    Arrow projection, one 8-way explode (the L tables), one hash
    aggregate — no joins, no driver data path.
    """
    v = _vectors(spark, sf_dir)
    buckets = _lsh_bucket_seq_udf()
    return (
        v.select(
            F.posexplode(buckets(F.col("v"))).alias("table_idx", "bucket")
        )
        .groupBy("table_idx", "bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("table_idx", "bucket")
    )


NEARDUP_COS = 0.40  # τ tuned to the synthetic embedding distribution


def q66_embedding_neardup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully oracle-backed embedding near-dup: seq-fold LSH candidates +
    exact cosine verify ≥ τ.

    Same pipeline as the production q55 (bucket-join candidate
    generation → exact-cosine verification, precision 1.0 by
    construction), but the bucket ids come from the SEQUENTIAL-fold
    kernel (:func:`_lsh_bucket_seq_udf`, the q63 twin) whose IEEE
    association DuckDB reproduces bit-for-bit — so the ENTIRE operator
    (candidate structure + pair set + verified cosines) is
    value-checkable, not just its bucket histogram.  q63's standalone
    histogram twin is demoted from the driver window in favor of this:
    any bucket error here changes the pair set and fails the hash
    compare, so the structure proof is subsumed.

    Plan shape at 10^9 vectors: identical to q55 — the dedup shuffle
    carries 16-byte id pairs only (vectors join back after the
    distinct), no cross join, no driver data path.
    """
    v = _vectors(spark, sf_dir)
    buckets = _lsh_bucket_seq_udf()
    bucketed = v.select(
        "vec_id",
        F.posexplode(buckets(F.col("v"))).alias("table_idx", "bucket"),
    )
    a = bucketed.select(F.col("vec_id").alias("a_id"), "table_idx", "bucket")
    b = bucketed.select(F.col("vec_id").alias("b_id"), "table_idx", "bucket")
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    va = v.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = v.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            (F.expr(_DOT) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= NEARDUP_COS)
        .select("a_id", "b_id", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "a_id", "b_id")
    )


def _oracle_embedding_neardup() -> str:
    """Buckets via the q63 CASE-bit construction; norms via
    ``list_dot_product(vec, vec)`` (proven sequential association — the
    τ comparison happens on unrounded doubles, so the norm must match
    Spark's unrolled sum bit-for-bit, not just to 6 decimals)."""
    planes = lsh_plane_literals()
    legs = []
    for ti, table in enumerate(planes):
        bits = " + ".join(
            "(CASE WHEN list_dot_product(vec, ["
            + ", ".join(f"{float(p[i])}" for i in range(len(p)))
            + f"]) >= 0 THEN {1 << j} ELSE 0 END)"
            for j, p in enumerate(table)
        )
        legs.append(
            f"SELECT vec_id, {ti} AS table_idx, "
            f"CAST({bits} AS INT) AS bucket FROM v"
        )
    union = " UNION ALL ".join(legs)
    return f"""
        WITH {_SQL_VECTORS},
        nd AS (
            SELECT vec_id, vec,
                   sqrt(list_dot_product(vec, vec)) AS nrm
            FROM v
        ),
        cells AS ({union}),
        cand AS (
            SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
            FROM cells a
            JOIN cells b
              ON a.table_idx = b.table_idx AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
        ),
        verified AS (
            SELECT c.a_id, c.b_id,
                   list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm) AS cos
            FROM cand c
            JOIN nd x ON x.vec_id = c.a_id
            JOIN nd y ON y.vec_id = c.b_id
        )
        SELECT a_id, b_id, round(cos, 6) AS cosine
        FROM verified
        WHERE cos >= {NEARDUP_COS}
        ORDER BY cosine DESC, a_id, b_id
    """


_IVF_TWIN_CELLS = 32  # fixed quantizer size for the oracle-checkable twin
_IVF_TWIN_REPLICAS = 2  # same multi-assignment R as the production IVF


def q65_ivf_cell_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable IVF twin: per-(cell, replica) assignment histogram.

    q54's production IVF path is not SQL-expressible end-to-end (the
    k-means trainer's partial-sum reduction order is
    partition-arrival-dependent, and its assignment kernel folds dots
    BLAS-style), so — the q63 trick applied to IVF — this twin recomputes
    the exact ASSIGNMENT STRUCTURE the inverted file relies on with fully
    deterministic, cross-engine-reproducible pieces:

    - centroids = the ``_IVF_TWIN_CELLS`` vectors with the smallest
      ``md5_60bit(vec_id)`` (the cross-engine portable hash,
      ``common.md5_60bit``), unit-normalized with a SEQUENTIAL
      sum-of-squares fold — i.e. the seeded-trainer's deterministic
      seeding step, iteration 0;
    - per-vector cell dots via a sequential-fold Arrow kernel whose IEEE
      association matches DuckDB's ``list_dot_product`` bit-for-bit;
    - top-``_IVF_TWIN_REPLICAS`` cells per vector with the same
      (dot DESC, cell ASC) tie-break as the oracle's ``row_number``.

    The resulting (cell, replica) population histogram value-checks the
    multi-assignment candidate-generation structure of the last
    unverified ANN path (q54 keeps its pytest recall check for the
    trained quantizer).  Plan shape at 10^9 vectors: one TakeOrdered for
    the 32 seeds (O(cells) driver traffic, same as production), one scan
    through a vectorized Arrow projection, one 2-way explode, one hash
    aggregate — no joins, no O(data) driver path.
    """
    from .common import md5_60bit

    v = _vectors(spark, sf_dir).filter(F.col("nrm") > 0)
    seeds = (
        v.select("vec_id", "v")
        .withColumn("_h", md5_60bit(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(_IVF_TWIN_CELLS)
        .collect()
    )
    cents = np.stack([np.asarray(r["v"], dtype=np.float64) for r in seeds])
    # sequential-fold norm (cumsum == DuckDB's list_dot_product(vec,vec)
    # left-to-right association), then one elementwise divide — the
    # centroid DOUBLES are bit-identical to the oracle's
    norms = np.sqrt(np.cumsum(cents * cents, axis=1)[:, -1])
    cents = cents / norms[:, None]
    n_replicas = min(_IVF_TWIN_REPLICAS, len(seeds))

    def _assign(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            # (n, cells, dim) signed terms → sequential fold along dim;
            # chunked so the intermediate stays ~tens of MB per slice
            out_cells = []
            for lo in range(0, len(m), 2048):
                mm = m[lo : lo + 2048]
                dots = np.cumsum(
                    mm[:, None, :] * cents[None, :, :], axis=2
                )[:, :, -1]
                # stable argsort of -dots == (dot DESC, cell ASC)
                out_cells.append(
                    np.argsort(-dots, axis=1, kind="stable")[:, :n_replicas]
                )
            top = np.concatenate(out_cells)
            yield pd.DataFrame(
                {
                    "cell": top.ravel().astype(np.int32),
                    "replica": np.tile(
                        np.arange(n_replicas, dtype=np.int32), len(m)
                    ),
                }
            )

    return (
        v.select("v")
        .mapInPandas(_assign, "cell int, replica int")
        .groupBy("cell", "replica")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell", "replica")
    )


def _oracle_ivf_cell_histogram() -> str:
    return f"""
        WITH v0 AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings
            WHERE len(embedding) = {_DIM}
        ),
        nz AS (
            SELECT vec_id, vec FROM v0
            WHERE sqrt(list_aggregate(list_transform(vec, x -> x * x),
                                      'sum')) > 0
        ),
        h AS (
            SELECT vec_id, vec,
                   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS hh
            FROM nz
        ),
        seeds AS (
            SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) - 1
                        AS INT) AS cell,
                   list_transform(
                       vec, x -> x / sqrt(list_dot_product(vec, vec))
                   ) AS c
            FROM h
            QUALIFY row_number() OVER (ORDER BY hh, vec_id)
                    <= {_IVF_TWIN_CELLS}
        ),
        dots AS (
            SELECT nz.vec_id, s.cell, list_dot_product(nz.vec, s.c) AS d
            FROM nz CROSS JOIN seeds s
        ),
        ranked AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d DESC, cell ASC) AS rnk
            FROM dots
        )
        SELECT cell, CAST(rnk - 1 AS INT) AS replica,
               count(*) AS n_vectors
        FROM ranked
        WHERE rnk <= {_IVF_TWIN_REPLICAS}
        GROUP BY cell, replica
        ORDER BY cell, replica
    """


def _oracle_bucket_histogram() -> str:
    planes = lsh_plane_literals()
    legs = []
    for ti, table in enumerate(planes):
        bits = " + ".join(
            "(CASE WHEN list_dot_product(vec, ["
            + ", ".join(f"{float(p[i])}" for i in range(len(p)))
            + f"]) >= 0 THEN {1 << j} ELSE 0 END)"
            for j, p in enumerate(table)
        )
        legs.append(
            f"SELECT {ti} AS table_idx, CAST({bits} AS INT) AS bucket FROM v"
        )
    union = " UNION ALL ".join(legs)
    return f"""
        WITH {_SQL_VECTORS},
        cells AS ({union})
        SELECT table_idx, bucket, count(*) AS n_vectors
        FROM cells
        GROUP BY table_idx, bucket
        ORDER BY table_idx, bucket
    """


_SQL_VECTORS = f"""
    v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
        WHERE len(embedding) = {_DIM}
    ),
    n AS (
        SELECT vec_id, vec,
               sqrt(list_aggregate(list_transform(vec, x -> x * x), 'sum'))
                   AS nrm
        FROM v
    )
"""

SIMILARITY_ORACLES: dict[str, str] = {
    "q63_lsh_bucket_histogram": _oracle_bucket_histogram(),
    "q65_ivf_cell_histogram": _oracle_ivf_cell_histogram(),
    "q66_embedding_neardup_sql": _oracle_embedding_neardup(),
    "q44_top20_similar_pairs": f"""
        WITH {_SQL_VECTORS}
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm), 6)
                   AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        ORDER BY cosine DESC, a_id, b_id
        LIMIT 20
    """,
    "q49_label_centroids": """
        WITH dims AS (
            SELECT label,
                   i - 1 AS dim,
                   CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS t(i)
        ),
        cent AS (
            SELECT label, dim, avg(x) AS c
            FROM dims GROUP BY label, dim
        ),
        norms AS (
            SELECT label,
                   round(sqrt(sum(c * c)), 6) AS centroid_norm,
                   count(*) AS n_dims
            FROM cent GROUP BY label
        )
        SELECT n.label, n.centroid_norm, n.n_dims, v.n_vectors
        FROM norms n
        JOIN (SELECT label, count(*) AS n_vectors
              FROM embeddings GROUP BY label) v USING (label)
        ORDER BY label
    """,
    "q45_cosine_topk": f"""
        WITH {_SQL_VECTORS},
        pairs AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
            FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id != b.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
                   round(cos, 6) AS cosine
            FROM pairs
        )
        SELECT query_id, neighbor_id, rank, cosine
        FROM ranked
        WHERE rank <= 5
        ORDER BY query_id, rank
    """,
}


def q49_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors: positional explode →
    per-dimension mean → re-assembled norm.  The aggregation shape IVF-style
    ANN uses to build coarse quantizers."""
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        F.posexplode(F.expr(_TO_DOUBLE)).alias("dim", "x"),
    )
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    return (
        cent.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias(
                "centroid_norm"
            ),
            F.count("*").alias("n_dims"),
        )
        .join(
            emb.groupBy("label").agg(F.count("*").alias("n_vectors")),
            "label",
        )
        .orderBy("label")
    )


def q55_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH candidates + exact verify.

    The dedup variant of the ANN machinery: every vector is bucketed in L
    sign-plane tables (see :func:`_lsh_bucketed`), same-bucket pairs are
    the candidates, and each candidate is verified with the exact cosine
    before being reported as a near-dup (cosine ≥ τ).  Precision is 1.0 by
    construction — every reported pair really clears τ; recall is the LSH
    recall, measured in pytest against the brute-force pair set.  At 10^9
    vectors the bucket join is the only pair generator — no cross-join
    anywhere (reference capability: duplicate detection, its
    ``sql/queries.sql`` exact-dup query; this is the embedding-space
    analogue for training-data curation).  Rows-only driver check
    (approximate by construction).
    """
    v = _vectors(spark, sf_dir)
    bucketed = _lsh_bucketed(v).select("vec_id", "table_idx", "bucket")
    # candidate generation over 16-byte id pairs; vectors join back AFTER
    # the distinct so the dedup shuffle never carries the embeddings
    a = bucketed.select(F.col("vec_id").alias("a_id"), "table_idx", "bucket")
    b = bucketed.select(F.col("vec_id").alias("b_id"), "table_idx", "bucket")
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    va = v.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = v.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            (F.expr(_DOT) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= NEARDUP_COS)
        .select("a_id", "b_id", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "a_id", "b_id")
    )


_KMEANS_ITERS = 3
_PROBE_SHARE = 3  # probe n_cells // _PROBE_SHARE cells per query
_ASSIGN_REPLICAS = 2  # index each vector in its R nearest cells


def _unit_rows(pdf) -> "np.ndarray":
    import pandas as pd  # noqa: F401 (Arrow batches arrive as pandas)

    m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _merge_cell_partials(pdf) -> "pd.DataFrame":
    """Reduce one cell's per-batch partials to a single (n, sum-vector)
    row — numpy element-wise, O(upstream partitions) rows per group."""
    m = np.stack(pdf["s"].to_numpy()).astype(np.float64)
    return pd.DataFrame(
        {
            "cell": [int(pdf["cell"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "s": [m.sum(axis=0)],
        }
    )


def train_kmeans_cells(
    v: DataFrame, n_cells: int, iters: int = _KMEANS_ITERS
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained distributed.

    Seeding is deterministic (the ``n_cells`` vectors with the smallest
    ``xxhash64(vec_id)`` — a seed-free uniform sample).  Each Lloyd
    iteration is ONE pass over the vectors: an Arrow-batched kernel emits
    per-batch partial (cell, count, sum-vector) rows — a map-side combine,
    so nothing bigger than ``n_cells x dim`` per batch ever shuffles — and
    a per-cell array-wise reduce yields the new centroids.  Driver traffic
    per iteration is O(cells) rows each carrying one dim-array (~16 MB at
    10^9 vectors), not O(cells x dim) scalar rows; the current centroid
    matrix rides a ``sparkContext.broadcast`` (torrent-distributed once
    per executor), never task-closure pickling.
    """
    spark = v.sparkSession
    seeds = (
        v.select("vec_id", "v")
        .withColumn("_h", F.xxhash64(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(n_cells)
        .collect()
    )
    cent = np.stack([np.asarray(r["v"], dtype=np.float64) for r in seeds])
    cent /= np.maximum(np.linalg.norm(cent, axis=1), 1e-12)[:, None]

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cent)

        def _partials(iterator):
            import pandas as pd

            c = bc.value
            for pdf in iterator:
                if len(pdf) == 0:
                    continue
                u = _unit_rows(pdf)
                cell = (u @ c.T).argmax(axis=1)
                hit = np.unique(cell)
                sums = np.zeros((hit.size, c.shape[1]))
                counts = np.zeros(hit.size, dtype=np.int64)
                for j, cc in enumerate(hit):
                    sel = cell == cc
                    sums[j] = u[sel].sum(axis=0)
                    counts[j] = int(sel.sum())
                yield pd.DataFrame(
                    {
                        "cell": hit.astype(np.int32),
                        "n": counts,
                        "s": list(sums),
                    }
                )

        rows = (
            v.select("v")
            .mapInPandas(_partials, "cell int, n long, s array<double>")
            .groupBy("cell")
            .applyInPandas(
                _merge_cell_partials, "cell int, n long, s array<double>"
            )
            .collect()
        )
        bc.destroy()
        new = cent.copy()
        for r in rows:
            new[r["cell"]] = np.asarray(r["s"], dtype=np.float64)
        # cells absent from `rows` (no assignments) keep their previous
        # centroid because `new` starts as a copy
        norms = np.maximum(np.linalg.norm(new, axis=1), 1e-12)
        cent = new / norms[:, None]
    return cent


def q54_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a real coarse quantizer: √n spherical-k-means cells.

    Train ``n_cells ≈ √n`` centroids (see :func:`train_kmeans_cells`),
    assign every vector to its nearest cell in one Arrow-batched pass (no
    n x cells row explosion, no per-vector shuffle), and for each query
    probe only the nearest quarter of the cells — the inverted-file
    pattern: at 10^9 vectors the candidate set shrinks ~√n vs brute
    force while multi-probe keeps recall high.  Rows-only driver check
    (approximate by construction); pytest measures recall vs exact top-k.
    """
    v = _vectors(spark, sf_dir)
    n = v.count()
    n_cells = int(np.clip(round(np.sqrt(n)), 4, 256))
    nprobe = max(2, n_cells // _PROBE_SHARE)
    # the trained quantizer ships via sparkContext.broadcast (one torrent
    # transfer per executor) instead of being pickled into every task
    bc_cent = spark.sparkContext.broadcast(train_kmeans_cells(v, n_cells))

    def _assign(iterator):
        import pandas as pd

        cent = bc_cent.value
        # multi-assignment: each vector is indexed in its R nearest cells
        # (R x storage, standard IVF trick) so a neighbor sitting just
        # across a cell boundary is still found by the probe
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            u = _unit_rows(pdf)
            top = np.argsort(-(u @ cent.T), axis=1)[:, :_ASSIGN_REPLICAS]
            rep = np.repeat(np.arange(len(pdf)), _ASSIGN_REPLICAS)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[rep],
                    "v": pdf["v"].to_numpy()[rep],
                    "nrm": pdf["nrm"].to_numpy()[rep],
                    "cell": top.ravel().astype(np.int32),
                }
            )

    assigned = v.mapInPandas(
        _assign, "vec_id long, v array<double>, nrm double, cell int"
    )

    def _probe(iterator):
        import pandas as pd

        cent = bc_cent.value
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            u = _unit_rows(pdf)
            top = np.argsort(-(u @ cent.T), axis=1)[:, :nprobe]
            rep = np.repeat(np.arange(len(pdf)), nprobe)
            yield pd.DataFrame(
                {
                    "a_id": pdf["vec_id"].to_numpy()[rep],
                    "va": pdf["v"].to_numpy()[rep],
                    "na": pdf["nrm"].to_numpy()[rep],
                    "cell": top.ravel().astype(np.int32),
                }
            )

    probes = v.filter(F.col("vec_id") < 10).mapInPandas(
        _probe, "a_id long, va array<double>, na double, cell int"
    )
    cand = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "cell",
    )
    pairs = (
        probes.join(cand, "cell")
        .filter(F.col("a_id") != F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            (F.expr(_DOT) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("b_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("a_id").alias("query_id"),
            F.col("b_id").alias("neighbor_id"),
            F.col("rank"),
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )
