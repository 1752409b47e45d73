"""Ordered event funnel — batch staging logic, shared by the catalog
entry (``events_funnel``), the streaming twin
(``streaming/events.py:funnel_stages``) equivalence test, and any
pipeline that needs per-user progression.

Semantics: deepest ordered step chain per user — the earliest step-1
event, the earliest step-2 event at-or-after it, the earliest step-3
event at-or-after that. Min-timestamps make the result deterministic;
``>=`` comparisons mean a later step at exactly the earlier step's
timestamp counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_user_stages(
    events: DataFrame,
    steps: tuple[str, str, str] = FUNNEL_STEPS,
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, stage, t1_us, t3_us) for every user who reached step 1.

    Each step is one filtered aggregate plus one user-keyed join — no
    window over the full event stream, so the plan scales with the
    per-step event counts, not total events × steps.
    """
    ev = events.select(
        "user_id", "event_type", F.unix_micros(ts_col).alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == steps[1])
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == steps[2])
        .join(c, "user_id")
        .filter(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    return (
        v.join(c.select("user_id", "t2"), "user_id", "left")
        .join(p.select("user_id", "t3"), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
            .alias("stage"),
            F.col("t1").alias("t1_us"),
            F.col("t3").alias("t3_us"),
        )
    )
