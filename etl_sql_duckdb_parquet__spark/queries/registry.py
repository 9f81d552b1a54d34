"""Registry wiring every query callable to its optional DuckDB oracle."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    asof,
    dedup,
    encode_queries,
    multimodal,
    similarity,
    streaming_agg,
    textops,
)
from .analytics_oracles import ANALYTICS_ORACLES
from .asof import ASOF_ORACLES
from .dedup import DEDUP_ORACLES
from .encode_queries import ENCODE_ORACLES
from .multimodal import MULTIMODAL_ORACLES
from .similarity import SIMILARITY_ORACLES
from .streaming_agg import STREAMING_AGG_ORACLES
from .textops import TEXTOPS_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
for mod in (
    analytics,
    asof,
    textops,
    dedup,
    similarity,
    multimodal,
    encode_queries,
    streaming_agg,
):
    for name in dir(mod):
        if name.startswith("q") and name[1:3].isdigit():
            REGISTRY[name] = getattr(mod, name)

ORACLES: dict[str, str] = {}
for oracles in (
    ANALYTICS_ORACLES,
    ASOF_ORACLES,
    TEXTOPS_ORACLES,
    DEDUP_ORACLES,
    SIMILARITY_ORACLES,
    MULTIMODAL_ORACLES,
    ENCODE_ORACLES,
    STREAMING_AGG_ORACLES,
):
    ORACLES.update(oracles)

# every oracle key must have a query
_missing = set(ORACLES) - set(REGISTRY)
if _missing:  # pragma: no cover - import-time sanity
    raise RuntimeError(f"oracles without queries: {sorted(_missing)}")
