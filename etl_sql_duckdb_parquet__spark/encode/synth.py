"""Deterministic construction of the tokenized-sequence input table.

Two sources, both pure Spark SQL expressions (JVM-side, no Python in the
data path, seed-fixed — reruns are bit-identical):

- :func:`tokenize_documents` — derives tokens from the driver-provided
  ``documents.parquet`` (TESTDATA.md) with a hash tokenizer: lowercase,
  split on non-alphanumerics, token id = xxhash64(word, seed) mod vocab.
  Word frequencies are naturally zipfian, so the token stream statistics
  resemble real BPE output.
- :func:`synth_token_table` — fully synthetic at any row count (for scale
  benches): doc ids from ``spark.range``, a skewed ``source`` distribution
  (~70% one hot source — exercises the salting path), per-doc lengths and
  skewed token ids derived from xxhash64 chains.

The reference's analogue is its seeded example dataset
(``data/raw/.../README_DATASET.md``); ours must synthesize because the
reference's tables have no token arrays (SURVEY.md §1.2: the north star
adds ``array<int>``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50257  # GPT-2-style vocab size; any positive int works
SEED = 42


def tokenize_documents(
    spark: SparkSession,
    sf_dir: str,
    vocab: int = VOCAB_SIZE,
    seed: int = SEED,
) -> DataFrame:
    """documents.parquet → (doc_id, tokens, n_tok, source), deterministic.

    Entirely built-in expressions: split/filter/transform/xxhash64 — the
    whole tokenizer runs inside whole-stage codegen, no Python.
    """
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    words = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
        lambda w: w != F.lit(""),
    )
    tokens = F.transform(
        words,
        lambda w: F.pmod(F.xxhash64(w, F.lit(seed)), F.lit(vocab)).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("doc_"), F.lpad(F.col("doc_id").cast("string"), 10, "0")).alias(
            "doc_id"
        ),
        tokens.alias("tokens"),
        F.size(tokens).alias("n_tok"),
        F.col("source"),
    )


def synth_token_table(
    spark: SparkSession,
    n_docs: int,
    vocab: int = VOCAB_SIZE,
    seed: int = SEED,
    avg_len: int = 256,
    skew_source: bool = True,
) -> DataFrame:
    """Fully synthetic token table at arbitrary scale, seed-fixed.

    Token ids are skew-transformed (u^3 mapping → zipf-ish rank-frequency)
    so compression behaves like real tokenized text.  ``skew_source`` makes
    ~70% of docs share one source value — the adversarial case for
    source-aware partitioning.
    """
    base = spark.range(n_docs).select(F.col("id").alias("i"))
    h = F.xxhash64(F.col("i"), F.lit(seed))
    # per-doc length in [16, 2*avg_len): uniform via hash
    n_tok = (F.pmod(h, F.lit(2 * avg_len - 16)) + F.lit(16)).cast("int")
    src_bucket = F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 1)), F.lit(10))
    if skew_source:
        source = (
            F.when(src_bucket < 7, "web")
            .when(src_bucket < 8, "books")
            .when(src_bucket < 9, "code")
            .otherwise("wiki")
        )
    else:
        source = F.concat(F.lit("src_"), src_bucket.cast("string"))
    df = base.select(
        F.concat(F.lit("doc_"), F.lpad(F.col("i").cast("string"), 12, "0")).alias(
            "doc_id"
        ),
        F.col("i"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )
    # token at position p: u = hash(i, p, seed)/2^63 in [0,1);
    # id = floor(vocab * u^3) → zipf-ish skew toward small ids
    tok_expr = F.transform(
        F.sequence(F.lit(1), F.col("n_tok")),
        lambda p: F.floor(
            F.lit(float(vocab))
            * F.pow(
                F.abs(F.xxhash64(F.col("i"), p, F.lit(seed + 2))).cast("double")
                / F.lit(float(2**63)),
                F.lit(3.0),
            )
        ).cast("int"),
    )
    return df.select("doc_id", tok_expr.alias("tokens"), "n_tok", "source")
