"""SQL-file entry point (reference ``src/cli.py:102-176``): quoted-
semicolon-safe statement splitting + two statements run from one file."""

from __future__ import annotations

from etl_sql_duckdb_parquet__spark.queries.cli import run_sql, split_sql

SF_DIR = "/root/testdata/sf0.01"


def test_split_sql_quotes_and_comments():
    script = """
    -- leading comment; with a semicolon
    SELECT 'a;b' AS s, "x;y" FROM t;  -- trailing; comment
    SELECT 1;
    SELECT 'it''s;fine'
    """
    stmts = split_sql(script)
    assert len(stmts) == 3, stmts
    assert "'a;b'" in stmts[0]
    # the trailing comment stays attached to the following statement
    # (legal SQL); the quoted/commented semicolons never split
    assert stmts[1].endswith("SELECT 1")
    assert "it''s;fine" in stmts[2]


def test_run_sql_file_two_statements(spark, tmp_path):
    f = tmp_path / "q.sql"
    f.write_text(
        "SELECT count(*) AS n FROM orders;\n"
        "SELECT r_name FROM region WHERE r_name = 'ASIA';\n"
    )
    results = run_sql(spark, SF_DIR, split_sql(f.read_text()))
    assert len(results) == 2
    (s1, r1), (s2, r2) = results
    assert r1[0]["n"] > 0
    assert r2[0]["r_name"] == "ASIA"
