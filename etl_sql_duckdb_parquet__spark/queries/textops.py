"""Text-analysis operators over the ``documents`` table — token counting,
language-ID heuristic, quality scoring, fingerprinting (the training-data
pipeline ops the north star adds on top of the reference's ETL; the
reference's closest analogues are its profiling stats,
``src/profiling.py:12-42``, applied here to text).

All expressions are JVM-side (regexp/length/hash built-ins) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import md5_60bit, t

_WORD_RE = "[a-z0-9]+"
_STOP_RE = r"\b(the|a|of|data|value)\b"


def q30_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts, aggregated per source."""
    docs = t(spark, sf_dir, "documents")
    ws_tok = F.expr("size(regexp_extract_all(text, '[^ ]+', 0))")
    alnum_tok = F.expr(f"size(regexp_extract_all(lower(text), '{_WORD_RE}', 0))")
    # BPE-ish: alpha runs, single digits, single punctuation marks
    bpe_tok = F.expr(
        "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]', 0))"
    )
    per_doc = docs.select(
        "source",
        ws_tok.alias("ws"),
        alnum_tok.alias("alnum"),
        bpe_tok.alias("bpe"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("sum_ws_tokens"),
            F.sum("alnum").alias("sum_alnum_tokens"),
            F.sum("bpe").alias("sum_bpe_tokens"),
            F.round(F.avg("alnum"), 2).alias("avg_alnum_tokens"),
        )
        .orderBy("source")
    )


def q31_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-presence language heuristic → confusion counts vs `lang`."""
    docs = t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    predicted = (
        F.when(padded.contains(" the "), "en")
        .when(padded.contains(" der "), "de")
        .when(padded.contains(" le "), "fr")
        .otherwise("unknown")
    )
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


def q32_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/alpha/stopword-ratio quality score, averaged per source."""
    docs = t(spark, sf_dir, "documents")
    low = F.lower("text")
    n_chars = F.length("text").cast("double")
    n_alpha = F.length(F.regexp_replace(low, "[^a-z]", "")).cast("double")
    n_words = F.expr(
        f"size(regexp_extract_all(lower(text), '{_WORD_RE}', 0))"
    ).cast("double")
    # pattern as a Column literal — F.expr would route it through the SQL
    # parser, which eats the \b escapes in the string literal
    n_stop = F.size(
        F.regexp_extract_all(low, F.lit(_STOP_RE), F.lit(0))
    ).cast("double")
    score = F.round(
        0.4 * F.least(F.lit(1.0), n_words / 50.0)
        + 0.4 * (n_alpha / n_chars)
        + 0.2 * F.least(F.lit(1.0), 5.0 * n_stop / n_words),
        4,
    )
    per_doc = docs.select("source", score.alias("score"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_score"),
            F.round(F.min("score"), 4).alias("min_score"),
            F.round(F.max("score"), 4).alias("max_score"),
        )
        .orderBy("source")
    )


def q33_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content MD5 fingerprints: distinct count per source."""
    docs = t(spark, sf_dir, "documents")
    norm = F.concat_ws(
        " ", F.expr(f"regexp_extract_all(lower(text), '{_WORD_RE}', 0)")
    )
    fp = F.md5(norm)
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_fingerprints"),
        )
        .orderBy("source")
    )


def q34_doc_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document length distribution (exact median)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 2).alias("median_chars"),
        )
        .orderBy("lang")
    )


# Deterministic split thresholds: integer fractions of the 60-bit hash
# space (exact in both engines, no float division anywhere)
_SPLIT_SEED = "split-v1"
_T_TRAIN = (1 << 60) * 4 // 5  # 80%
_T_VAL = (1 << 60) * 9 // 10   # +10%; remainder = test


def q61_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment by salted md5 fraction.

    The canonical training-data split: each document's fate is a pure
    function of (seed, doc_id) — stable across runs, re-shufflable by
    bumping the seed, no RNG state to coordinate across executors, and
    joins/filters on the split column stay embarrassingly parallel.  The
    60-bit md5 prefix is computable bit-identically in DuckDB, so the
    assignment itself (not just the counts' shape) is oracle-checked.
    """
    docs = t(spark, sf_dir, "documents")
    h = md5_60bit(
        F.concat(F.lit(_SPLIT_SEED + ":"), F.col("doc_id").cast("string"))
    )
    split = (
        F.when(h < _T_TRAIN, "train")
        .when(h < _T_VAL, "val")
        .otherwise("test")
    )
    return (
        docs.groupBy("source", split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("source", "split")
    )


TEXTOPS_ORACLES: dict[str, str] = {
    "q61_deterministic_split": f"""
        WITH h AS (
            SELECT source, n_chars,
                   CAST('0x' || substr(
                       md5('{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)),
                       1, 15) AS BIGINT) AS hv
            FROM documents
        )
        SELECT source,
               CASE WHEN hv < {_T_TRAIN} THEN 'train'
                    WHEN hv < {_T_VAL} THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM h
        GROUP BY source, split
        ORDER BY source, split
    """,
    "q30_token_counts": """
        WITH per_doc AS (
            SELECT source,
                   len(regexp_extract_all(text, '[^ ]+')) AS ws,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS alnum,
                   len(regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]|[^a-z0-9 ]')) AS bpe
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(ws) AS BIGINT) AS sum_ws_tokens,
               CAST(sum(alnum) AS BIGINT) AS sum_alnum_tokens,
               CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
               round(avg(alnum), 2) AS avg_alnum_tokens
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
    "q31_lang_id": """
        WITH p AS (
            SELECT lang,
                   CASE WHEN contains(' ' || lower(text) || ' ', ' the ') THEN 'en'
                        WHEN contains(' ' || lower(text) || ' ', ' der ') THEN 'de'
                        WHEN contains(' ' || lower(text) || ' ', ' le ') THEN 'fr'
                        ELSE 'unknown' END AS predicted
            FROM documents
        )
        SELECT lang, predicted, count(*) AS n
        FROM p
        GROUP BY lang, predicted
        ORDER BY lang, predicted
    """,
    "q32_quality_score": """
        WITH per_doc AS (
            SELECT source,
                   round(
                     0.4 * least(1.0,
                         len(regexp_extract_all(lower(text), '[a-z0-9]+')) / 50.0)
                     + 0.4 * (CAST(length(regexp_replace(lower(text), '[^a-z]',
                            '', 'g')) AS DOUBLE) / length(text))
                     + 0.2 * least(1.0,
                         5.0 * len(regexp_extract_all(lower(text),
                             '\\b(the|a|of|data|value)\\b'))
                         / len(regexp_extract_all(lower(text), '[a-z0-9]+'))),
                   4) AS score
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               round(avg(score), 4) AS avg_score,
               round(min(score), 4) AS min_score,
               round(max(score), 4) AS max_score
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
    "q33_fingerprints": """
        WITH f AS (
            SELECT source,
                   md5(array_to_string(
                       regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               count(DISTINCT fp) AS n_fingerprints
        FROM f
        GROUP BY source
        ORDER BY source
    """,
    "q34_doc_length_stats": """
        SELECT lang,
               count(*) AS n_docs,
               round(avg(n_chars), 2) AS avg_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars,
               round(quantile_cont(n_chars, 0.5), 2) AS median_chars
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
}
