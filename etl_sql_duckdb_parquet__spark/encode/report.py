"""Markdown metrics report over the encode manifest — the reference's
benchmark/metrics report capability (ref ``src/reporting.py:273-343``,
``src/benchmarks.py:105-141``) applied to our engine's lineage manifest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .manifest import read_manifest


def manifest_report(spark: SparkSession, out_dir: str) -> str:
    """Per-codec and per-run totals from the manifest, as markdown."""
    m = read_manifest(spark, out_dir)
    if m is None:
        return "# Encode report\n\nNo manifest found.\n"
    by_codec = (
        m.filter(F.col("status") == "ok")
        .groupBy("codec")
        .agg(
            F.count("*").alias("parts"),
            F.sum("n_docs").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("comp_bytes").alias("comp"),
            F.round(F.sum("encode_s"), 3).alias("cpu_s"),
        )
        .orderBy("codec")
        .collect()
    )
    total = (
        m.filter(F.col("status") == "ok")
        .agg(
            F.countDistinct("run_id").alias("runs"),
            F.count("*").alias("parts"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("comp_bytes").alias("comp"),
        )
        .first()
    )
    lines = [
        "# Encode report",
        "",
        f"Runs: {total['runs']}  |  partitions: {total['parts']}  |  "
        f"raw: {total['raw']:,} B  |  compressed: {total['comp']:,} B  |  "
        f"ratio: {total['raw'] / max(total['comp'], 1):.2f}x",
        "",
        "| codec | parts | docs | tokens | raw B | comp B | ratio | cpu s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in by_codec:
        lines.append(
            f"| {r['codec']} | {r['parts']} | {r['docs']:,} | "
            f"{r['tokens']:,} | {r['raw']:,} | {r['comp']:,} | "
            f"{r['raw'] / max(r['comp'], 1):.2f}x | {r['cpu_s']} |"
        )
    return "\n".join(lines) + "\n"
