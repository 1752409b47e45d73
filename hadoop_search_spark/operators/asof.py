"""As-of (point-in-time) join — attach to each left row the values of
the LATEST right row at-or-before it within a partition key. The
classic time-series/attribution operator (DuckDB ``ASOF JOIN``,
pandas ``merge_asof``); Spark has no built-in, and the naive
range-join formulation (``l.ts >= r.ts`` + argmax) explodes into a
per-key cross product.

Scale-first formulation: **union + ordered window**. Tag both sides,
union them, and take ``last(right_payload, ignorenulls=True)`` over a
window partitioned by the join key and ordered by (ts, side). One
shuffle total (the window's partition), cost O(|L|+|R|) rows — no
range join, no per-key quadratic blowup, and AQE handles key skew the
same way it does for any window. This is the standard distributed
as-of technique (the same shape Flink's temporal join and
KDB's ``aj`` lower to).

Semantics: "at-or-before" — a right row with ts equal to the left
row's ts is visible to it (right sorts before left on ties via the
side tag, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``). Left
rows with no prior right row keep NULL payloads (left-join
semantics). The right payload travels as ONE struct, so all attached
columns come from the SAME right row even when some of its fields
are legitimately NULL (per-column ``last(ignorenulls)`` would mix
rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_prior(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_prior",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each ``left`` row, attach ``right_cols`` from the latest
    ``right`` row with ``right.ts_col <= left.ts_col`` and the same
    ``on`` key, as ``<col><suffix>`` columns (NULL when no such row).

    ``right_tiebreak`` names a right-side column that breaks exact
    ``ts_col`` ties deterministically (highest wins); without it,
    equal-timestamp right rows tie arbitrarily (irrelevant when
    timestamps are unique)."""
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    tb = (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("_tb")
    # A NULL-ts right row satisfies no "<= left.ts" predicate (SQL
    # three-valued logic, and DuckDB ASOF agrees) — but Spark's ASC
    # sort is NULLS FIRST, which would put it at the head of the
    # window where last(ignorenulls) attaches it to EVERY left row.
    # Drop such rows before the union.
    r2 = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_side"), payload, tb
    )

    left_only = [c for c in left.columns if c not in (on, ts_col)]
    l2 = left.select(
        on,
        ts_col,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_r"].dataType).alias("_r"),
        F.lit(None).cast(r2.schema["_tb"].dataType).alias("_tb"),
        *left_only,
    )
    r3 = r2.select(
        on,
        ts_col,
        "_side",
        "_r",
        "_tb",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_only
        ],
    )

    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),  # right rows visible to same-ts left rows
            F.col("_tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prior = F.last("_r", ignorenulls=True).over(w)
    return (
        l2.unionByName(r3)
        .withColumn("_prior", prior)
        .filter(F.col("_side") == 1)
        .select(
            on,
            ts_col,
            *left_only,
            *[F.col(f"_prior.{c}").alias(c + suffix) for c in right_cols],
        )
    )
