"""Interval (range) join — match points to the intervals containing
them. Spark's optimizer turns ``p.ts BETWEEN i.start AND i.end`` into
a broadcast-nested-loop or cartesian plan (a non-equi predicate has
no hash key), which is quadratic per key and unusable at scale.

Scale-first formulation: **time binning**. Chop the timeline into
fixed-width bins; an interval registers in every bin it overlaps
(``explode(sequence(...))`` — at most ``len/bin_width + 1`` copies),
a point lives in exactly one bin, and the join becomes an EQUI-join
on (key, bin) followed by the exact range filter. Each matching
(point, interval) pair is produced exactly once — in the point's own
bin — so no dedup pass is needed. Shuffle is keyed on (key, bin),
which is strictly finer than the raw key, so time-skew within a hot
key spreads across bins instead of landing on one reducer. This is
the standard distributed range-join technique (Spark's own
range-join hints on Databricks, Flink interval joins, and GIS
grid-binning all lower to it).

Choose ``bin_width`` near the typical interval length: bins much
smaller than intervals multiply interval copies
(``len/bin_width`` per interval); bins much larger put many
non-matching points in each bin (filter does more work). Both
directions stay correct."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row with
    the same ``on`` key and ``start_col <= ts_col <= end_col``
    (closed interval). Returns all columns from both sides (callers
    pre-alias collisions). ``ts_col``/``start_col``/``end_col`` are
    numeric (e.g. epoch micros) — convert timestamps first."""
    b = F.lit(bin_width)
    ivals = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
            )
        ),
    )
    pts = points.withColumn("_bin", F.floor(F.col(ts_col) / b))
    return (
        pts.join(ivals, [on, "_bin"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
