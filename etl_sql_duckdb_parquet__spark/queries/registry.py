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

# --- insertion-order policy for the driver's bounded correctness window ---
# The driver compares the FIRST 50 registry entries against their DuckDB
# oracles; anything past the window gets no correctness row even when an
# oracle exists.  Order therefore encodes priority:
#   1. oracle-backed queries (green-able), ascending by number — EXCEPT
#   2. demoted oracle-backed queries whose SURVEY §2 row is already proven
#      by another green query (q16 ⊂ A10 via q40, q44 ⊂ cosine via q45,
#      q24/q23 ⊂ F-family via q22/q25/q26 + transform pytest, and q23's
#      histogram-on-computed-key shape ⊂ A6 via q13) — these ride at the
#      back of the oracle-backed block so the window always prefers
#      unique-capability proofs (q24's slot went to q64, the stateful
#      streaming-sessionization proof; q23's goes to q65, the IVF
#      assignment-structure twin);
#   3. no-oracle queries last (they can only ever produce rows-only checks,
#      so a window slot is wasted on them).
# All entries remain registered and value-checked by test_oracle_parity.py
# regardless of position.  The 50-slot budget is EXECUTABLY guarded by
# tests/test_registry_window.py: adding an oracle-backed query without a
# matching demotion fails the suite loudly instead of silently evicting a
# green row (the round-3 bug class).
DRIVER_WINDOW = 50
_DEMOTED = (
    "q16_duplicate_events",
    "q44_top20_similar_pairs",
    "q24_ship_month",
    "q23_props_extract",
    # q63's bucket-structure proof is subsumed by q66 (same seq-fold
    # kernel + planes; a bucket error changes q66's pair set and fails
    # the hash compare), whose slot proves the full near-dup operator
    "q63_lsh_bucket_histogram",
)


def _window_rank(name: str) -> tuple[int, str]:
    if name not in ORACLES:
        return (2, name)
    if name in _DEMOTED:
        return (1, name)
    return (0, name)


REGISTRY = dict(sorted(REGISTRY.items(), key=lambda kv: _window_rank(kv[0])))
