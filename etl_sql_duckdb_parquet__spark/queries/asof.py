"""As-of join — a custom operator Spark's DataFrame API lacks.

Implemented as the canonical distributed union-and-window algorithm:
tag both inputs, union them on (key, time), then a running
``last(..., ignorenulls=True)`` window carries the most recent
right-side row forward onto each left-side row.  Cost = ONE shuffle on
the join key + a sort within partitions — no range-explosion join, no
per-key driver loop, and skew behaves exactly like any keyed window
(bounded by the largest single key's row count).

DuckDB has a native ``ASOF JOIN``, which is the oracle: the Spark
composition must reproduce it row-for-row (inclusive ``>=`` match
semantics; ties on the right side are pre-deduplicated to the max
event_id in BOTH engines so the match is well-defined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import epoch_seconds_ntz, t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Attach, to every ``left`` row, the latest ``right`` row of the same
    ``key`` with ``right_ts <= left_ts`` (null columns when none exists).

    ``right`` must be unique per (key, right_ts).  Output = all ``left``
    columns plus ``right``'s non-key columns.  The carried right row is
    a single struct through the window, so a NULL field in a matched
    right row stays NULL instead of falling back to an older row's
    value (row atomicity).
    """
    rcols = [c for c in right.columns if c != key]
    lcols = [c for c in left.columns if c != key]
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal time (_side 0 < 1), which
    # implements the inclusive <= match.
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rstruct = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in rcols])
    )
    carried = u.select(
        key,
        "_t",
        "_side",
        *lcols,
        F.last(rstruct, ignorenulls=True).over(w).alias("_r"),
    )
    return carried.filter(F.col("_side") == 1).select(
        key,
        *lcols,
        *[F.col(f"_r.{c}").alias(c) for c in rcols],
    )


def q58_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase → most-recent-prior-click attribution per user (as-of).

    The classic clickstream as-of join; oracle is DuckDB's native
    ``ASOF LEFT JOIN``.
    """
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "click_ts", "click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="click_ts"
    )
    return joined.select(
        "purchase_id", "user_id", "ts", "click_id", "click_ts"
    ).orderBy("purchase_id")


def q60_range_window_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase count of same-user clicks in the preceding hour.

    Range join expressed as a value-range window frame
    (``rangeBetween(-3600, 0)`` over epoch seconds) — one keyed shuffle,
    no inequality join (which Spark would plan as a broadcast-nested-loop
    at any scale).  Epoch seconds are floor-truncated identically in both
    engines so the frame boundaries agree exactly.
    """
    ev = t(spark, sf_dir, "events")
    sec = epoch_seconds_ntz(F.col("ts"))
    e = ev.select("event_id", "user_id", "event_type", "ts", sec.alias("sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    clicks = F.sum(
        F.when(F.col("event_type") == "click", 1).otherwise(0)
    ).over(w)
    return (
        e.withColumn("clicks_1h", clicks)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts",
            F.col("clicks_1h").cast("long").alias("clicks_1h"),
        )
        .orderBy("purchase_id")
    )


ASOF_ORACLES: dict[str, str] = {
    "q60_range_window_clicks": """
        WITH e AS (
            SELECT event_id, user_id, event_type, ts,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, event_type, ts,
                   count(*) FILTER (event_type = 'click') OVER (
                       PARTITION BY user_id ORDER BY sec
                       RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
                   ) AS clicks_1h
            FROM e
        )
        SELECT event_id AS purchase_id, user_id, ts,
               CAST(clicks_1h AS BIGINT) AS clicks_1h
        FROM w WHERE event_type = 'purchase' ORDER BY purchase_id
    """,
    "q58_asof_click_attribution": """
        WITH clicks AS (
            SELECT user_id, ts AS click_ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        ),
        p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id, p.ts, c.click_id, c.click_ts
        FROM p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
        ORDER BY purchase_id
    """,
}
