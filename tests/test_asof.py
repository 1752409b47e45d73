"""As-of join: at-or-before semantics, left-join nulls, same-row
payload integrity, tie-breaking."""

from pyspark.sql import functions as F

from hadoop_search_spark.operators.asof import asof_join_prior


def _left(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 50, "d")],
        "k LONG, t LONG, tag STRING",
    )


def test_asof_picks_latest_at_or_before(spark):
    right = spark.createDataFrame(
        [(1, 3, 30.0), (1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        "k LONG, t LONG, v DOUBLE",
    )
    out = {
        r.tag: r.v_prior
        for r in asof_join_prior(
            _left(spark), right, on="k", ts_col="t", right_cols=["v"]
        ).collect()
    }
    assert out["c"] == 30.0    # only t=3 precedes t=5
    assert out["a"] == 100.0   # equal timestamp is visible (<=)
    assert out["b"] == 150.0   # latest of 3,10,15
    assert out["d"] is None    # right row at t=60 is in the future


def test_asof_payload_comes_from_one_row(spark):
    # the latest right row has a NULL field: it must be attached as
    # NULL, not back-filled from an older row (struct payload, not
    # per-column last(ignorenulls))
    right = spark.createDataFrame(
        [(1, 2, 20.0, "x"), (1, 8, None, "y")],
        "k LONG, t LONG, v DOUBLE, s STRING",
    )
    out = {
        r.tag: (r.v_prior, r.s_prior)
        for r in asof_join_prior(
            _left(spark), right, on="k", ts_col="t", right_cols=["v", "s"]
        ).collect()
    }
    assert out["a"] == (None, "y")   # t=8 row wins; its v is genuinely NULL
    assert out["c"] == (20.0, "x")


def test_asof_tiebreak_on_equal_timestamps(spark):
    right = spark.createDataFrame(
        [(1, 10, 1, 111.0), (1, 10, 2, 222.0)],
        "k LONG, t LONG, seq LONG, v DOUBLE",
    )
    out = {
        r.tag: r.v_prior
        for r in asof_join_prior(
            _left(spark),
            right,
            on="k",
            ts_col="t",
            right_cols=["v"],
            right_tiebreak="seq",
        ).collect()
    }
    assert out["a"] == 222.0  # highest tiebreak wins among equal ts
    assert out["b"] == 222.0


def test_asof_plan_is_single_shuffle_no_range_join(spark):
    right = spark.createDataFrame([(1, 3, 30.0)], "k LONG, t LONG, v DOUBLE")
    df = asof_join_prior(_left(spark), right, on="k", ts_col="t", right_cols=["v"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # union+window: no join operator of any kind, exactly one shuffle
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


def test_asof_randomized_against_brute_force(spark):
    import random

    rng = random.Random(42)
    left = [(rng.randint(1, 5), rng.randint(0, 1000), i) for i in range(200)]
    right = [
        (rng.randint(1, 5), rng.randint(0, 1000), 10_000 + i, float(i))
        for i in range(200)
    ]
    ldf = spark.createDataFrame(left, "k LONG, t LONG, lid LONG")
    rdf = spark.createDataFrame(right, "k LONG, t LONG, rid LONG, v DOUBLE")
    got = {
        r.lid: (r.rid_prior, r.v_prior)
        for r in asof_join_prior(
            ldf, rdf, on="k", ts_col="t", right_cols=["rid", "v"],
            right_tiebreak="rid",
        ).collect()
    }

    def brute(k, t):
        cands = [r for r in right if r[0] == k and r[1] <= t]
        if not cands:
            return (None, None)
        best = max(cands, key=lambda r: (r[1], r[2]))  # latest ts, then tiebreak
        return (best[2], best[3])

    want = {lid: brute(k, t) for k, t, lid in left}
    assert got == want


def test_asof_null_ts_right_rows_never_match(spark):
    # a NULL-ts right row satisfies no "<= left.ts" predicate; it must
    # not be attached (it would otherwise sort NULLS FIRST to the head
    # of the window and attribute to every left row)
    ldf = spark.createDataFrame([(1, 5, 100)], "k LONG, t LONG, lid LONG")
    rdf = spark.createDataFrame(
        [(1, None, 30.0), (1, 2, 7.0)], "k LONG, t LONG, v DOUBLE"
    )
    rows = asof_join_prior(ldf, rdf, on="k", ts_col="t", right_cols=["v"]).collect()
    assert [(r.lid, r.v_prior) for r in rows] == [(100, 7.0)]
    # with ONLY a null-ts right row, the left row keeps a NULL payload
    rdf2 = spark.createDataFrame([(1, None, 30.0)], "k LONG, t LONG, v DOUBLE")
    rows2 = asof_join_prior(ldf, rdf2, on="k", ts_col="t", right_cols=["v"]).collect()
    assert [(r.lid, r.v_prior) for r in rows2] == [(100, None)]
