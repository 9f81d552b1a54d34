"""Package the engine for ``spark-submit --py-files``.

Produces a single zip of the ``etl_sql_duckdb_parquet__spark`` package::

    python tools/build_pyfiles.py [--out dist/engine.zip]
    spark-submit --py-files dist/engine.zip \
        etl_sql_duckdb_parquet__spark/encode/cli.py --out s3a://bucket/enc ...

Pure stdlib; excludes caches and tests.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "etl_sql_duckdb_parquet__spark"


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "engine.zip"))
    args = ap.parse_args()
    path = build(args.out)
    print(path)
