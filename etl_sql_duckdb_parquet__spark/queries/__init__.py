"""Query capability layer — SURVEY.md §2 operator inventory over the
driver testdata tables, plus the training-data-pipeline operators
(dedup / similarity / text analysis / multimodal plumbing) and the
codec-engine showcase queries.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered in
``REGISTRY``; SQL-expressible ones have a DuckDB oracle twin in
``ORACLES`` with identical output column names (driver contract in
``__spark_entry__.py``).
"""

from .registry import ORACLES, REGISTRY

__all__ = ["REGISTRY", "ORACLES"]
