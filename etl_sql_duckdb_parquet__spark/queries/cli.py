"""SQL entry point: run free-form SQL (a string or a ``.sql`` file) over
the registered parquet views with Spark SQL.

The reference's ``query`` command (reference ``src/cli.py:102-176``) does
the same with DuckDB, splitting the file naively on every ";"
(``cli.py:148-149``), which breaks statements containing quoted
semicolons.  :func:`split_sql` here is quote- and comment-aware: ";"
inside single/double-quoted literals or after ``--`` line comments never
splits a statement.

Usage::

    python -m etl_sql_duckdb_parquet__spark.queries.cli \
        --sf-dir /root/testdata/sf0.01 --file queries.sql
    python -m etl_sql_duckdb_parquet__spark.queries.cli \
        --sf-dir /root/testdata/sf0.01 --sql "SELECT count(*) FROM orders"
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from .common import register_views


def split_sql(text: str) -> list[str]:
    """Split a SQL script into statements on ";", honoring quotes and
    ``--`` line comments (a quoted ";" never splits)."""
    stmts: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    in_comment = False
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if in_comment:
            buf.append(ch)
            if ch == "\n":
                in_comment = False
            i += 1
            continue
        if quote:
            buf.append(ch)
            if ch == quote:
                # doubled quote = escaped quote inside the literal
                if i + 1 < n and text[i + 1] == quote:
                    buf.append(quote)
                    i += 1
                else:
                    quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "-" and i + 1 < n and text[i + 1] == "-":
            in_comment = True
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                stmts.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def run_sql(
    spark: SparkSession, sf_dir: str, statements: list[str], limit: int = 100
) -> list[tuple[str, list]]:
    """Register the testdata views and execute each statement; returns
    (statement, collected rows ≤ limit) pairs."""
    register_views(spark, sf_dir)
    out = []
    for stmt in statements:
        df = spark.sql(stmt)
        out.append((stmt, df.limit(limit).collect()))
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--file", help="SQL file (statements split on ';')")
    ap.add_argument("--sql", help="a single SQL string")
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args(argv)
    if not args.file and not args.sql:
        print("provide --file or --sql", file=sys.stderr)
        return 1
    if args.file:
        with open(args.file) as f:
            statements = split_sql(f.read())
    else:
        statements = split_sql(args.sql)
    from ..session import get_spark

    spark = get_spark(cores=args.cores)
    for stmt, rows in run_sql(spark, args.sf_dir, statements, args.limit):
        print(f"-- {stmt}")
        for r in rows:
            print(tuple(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
