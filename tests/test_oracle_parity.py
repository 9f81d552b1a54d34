"""Local replica of the driver's correctness gate: every queries() entry
runs on Spark AND (when present) its oracle_sql() twin on DuckDB at
sf0.01; row counts, column names, and order-insensitive canonical values
must match.  Mirrors the driver's sorted-columns value-hash comparison.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{tname}.parquet')"
        )
    yield con
    con.close()


def canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract for non-SQL-expressible ops
        assert list(sdf.columns)
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canon(sdf) == canon(odf)
