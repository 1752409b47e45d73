"""Interval join: closed-range semantics, exactly-once pairs across
bin boundaries, equi-join plan shape."""

from pyspark.sql import functions as F

from hadoop_search_spark.operators.interval import interval_join


def _run(spark, points, intervals, bin_width):
    p = spark.createDataFrame(points, "k LONG, t LONG, pid STRING")
    i = spark.createDataFrame(intervals, "k LONG, s LONG, e LONG, iid STRING")
    return interval_join(
        p, i, on="k", ts_col="t", start_col="s", end_col="e", bin_width=bin_width
    )


def test_interval_join_closed_range(spark):
    out = _run(
        spark,
        [(1, 5, "in"), (1, 10, "on_start"), (1, 20, "on_end"), (1, 21, "after"),
         (1, 9, "before"), (2, 15, "other_key")],
        [(1, 10, 20, "w")],
        bin_width=7,
    )
    assert {r.pid for r in out.collect()} == {"on_start", "on_end"}


def test_interval_join_exactly_once_across_bins(spark):
    # interval spans many bins; each contained point matches exactly once
    out = _run(
        spark,
        [(1, t, f"p{t}") for t in range(0, 100, 10)],
        [(1, 5, 95, "wide")],
        bin_width=10,
    )
    rows = out.collect()
    assert len(rows) == len({(r.pid, r.iid) for r in rows}) == 9  # 10..90
    # overlapping intervals each produce their own pair
    out2 = _run(
        spark,
        [(1, 50, "p")],
        [(1, 0, 60, "a"), (1, 40, 100, "b")],
        bin_width=10,
    )
    assert {r.iid for r in out2.collect()} == {"a", "b"}


def test_interval_join_plan_is_equi_join(spark):
    df = _run(spark, [(1, 5, "p")], [(1, 0, 10, "i")], bin_width=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point: a hash-keyed equi-join, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_interval_randomized_against_brute_force(spark):
    import random

    rng = random.Random(7)
    points = [(rng.randint(1, 4), rng.randint(0, 500), i) for i in range(300)]
    intervals = []
    for i in range(60):
        s = rng.randint(0, 500)
        intervals.append((rng.randint(1, 4), s, s + rng.randint(0, 80), 1000 + i))
    p = spark.createDataFrame(points, "k LONG, t LONG, pid LONG")
    iv = spark.createDataFrame(intervals, "k LONG, s LONG, e LONG, iid LONG")
    for bin_width in (1, 7, 40, 200):  # correct for any bin choice
        got = {
            (r.pid, r.iid)
            for r in interval_join(
                p, iv, on="k", ts_col="t", start_col="s", end_col="e",
                bin_width=bin_width,
            ).collect()
        }
        want = {
            (pid, iid)
            for k, t, pid in points
            for ik, s, e, iid in intervals
            if k == ik and s <= t <= e
        }
        assert got == want
