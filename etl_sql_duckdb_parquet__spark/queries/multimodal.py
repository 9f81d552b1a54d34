"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata
extracted by Arrow-batched Pandas UDFs.

The container has no image/audio libs, so the *decode* is a deterministic
stub (documented, per the build brief): payload bytes are the UTF-8 text
(stand-in for image bytes), and "decoded" metadata (dims, frame counts)
is derived arithmetically from the byte stream.  What is REAL and tested:
the BinaryType schema, the mapInPandas batch shape, the vectorized
metadata extraction, and the SQL-expressible oracle over the same bytes.
A production deployment swaps ``_fake_decode_meta`` for an actual
PIL/ffmpeg call with the same signature.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_FRAME_BYTES = 256
_FRAME_STRIDE = 4


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, media_type) — the multimodal
    column shape: opaque bytes + typed metadata."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("video").alias(
            "media_type"
        ),
    )


def _decode_meta_batches(iterator):
    """Stub decoder: per-batch vectorized metadata from the payload bytes.

    numpy over byte lengths for the fake dims; hashlib per payload for the
    content digest (the digest is the lineage hook a real decoder keeps).
    """
    for pdf in iterator:
        n_bytes = pdf["payload"].map(len).to_numpy(dtype=np.int64)
        width = 16 + n_bytes % 240
        height = 16 + (n_bytes * 7) % 240
        n_frames = (n_bytes + _FRAME_BYTES - 1) // _FRAME_BYTES
        n_sampled = (n_frames + _FRAME_STRIDE - 1) // _FRAME_STRIDE
        sha = [hashlib.sha256(p).hexdigest() for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "width": width.astype(np.int32),
                "height": height.astype(np.int32),
                "n_frames": n_frames,
                "n_sampled": n_sampled,
                "sha": sha,
            }
        )


_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "n_frames long, n_sampled long, sha string"
)


def q47_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → decoded metadata rows (first 50 docs, ordered)."""
    media = _media_table(spark, sf_dir).filter(F.col("doc_id") < 50)
    return (
        media.mapInPandas(_decode_meta_batches, _META_SCHEMA)
        .orderBy("doc_id")
    )


def q48_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type frame sampling totals over all docs."""
    media = _media_table(spark, sf_dir)
    meta = media.mapInPandas(_decode_meta_batches, _META_SCHEMA)
    return (
        meta.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("n_sampled").alias("total_sampled"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        )
        .orderBy("media_type")
    )


MULTIMODAL_ORACLES: dict[str, str] = {
    "q47_media_metadata": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END
                   AS media_type,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(16 + strlen(text) % 240 AS INT) AS width,
               CAST(16 + (strlen(text) * 7) % 240 AS INT) AS height,
               CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames,
               CAST(ceil(ceil(strlen(text) / 256.0) / 4.0) AS BIGINT)
                   AS n_sampled,
               sha256(text) AS sha
        FROM documents
        WHERE doc_id < 50
        ORDER BY doc_id
    """,
    "q48_frame_sample_stats": """
        WITH meta AS (
            SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END
                       AS media_type,
                   strlen(text) AS n_bytes,
                   CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames
            FROM documents
        )
        SELECT media_type,
               count(*) AS n_media,
               CAST(sum(n_frames) AS BIGINT) AS total_frames,
               CAST(sum(CAST(ceil(n_frames / 4.0) AS BIGINT)) AS BIGINT)
                   AS total_sampled,
               round(avg(n_bytes), 2) AS avg_bytes
        FROM meta
        GROUP BY media_type
        ORDER BY media_type
    """,
}
