"""HyperLogLog-as-relational-algebra: mergeability (exact), accuracy
vs exact distinct (inside the 3σ bound), cross-engine register parity
(the r7 oracle contract), partition invariance, and the small-range
correction helper."""

import duckdb
import pyspark.sql.functions as F

from hadoop_search_spark.operators.sketch import (
    HLL_P,
    hll_corrected,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_oracle_sql,
    hll_registers,
)

SF_DIR = "/root/testdata/sf0.001"


def _regs(df):
    return {(r.register, r.max_rho) for r in df.collect()}


def test_hll_merge_equals_union_sketch(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY — the
    mergeability that lets per-shard/per-day sketches compose without
    rescanning; also merge(s, s) == s (idempotent)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    sk_a = hll_registers(a, "l_partkey")
    sk_b = hll_registers(b, "l_partkey")
    merged = _regs(hll_merge(sk_a, sk_b))
    assert merged == _regs(hll_registers(li, "l_partkey"))
    assert _regs(hll_merge(sk_a, sk_a)) == _regs(sk_a)


def test_hll_estimate_inside_error_bound(spark):
    """Relative error vs the known cardinality within 3σ = 3·1.04/√m
    (~4.9% at p=12) at two cardinalities comfortably above the
    small-range regime (> 2.5·m); deterministic hash ⇒ the measured
    error is a constant of the recipe, not flake."""
    bound = 3 * 1.04 / (1 << HLL_P) ** 0.5
    for n in (50_000, 300_000):
        df = spark.range(n).select(F.col("id"))
        est = hll_distinct(df, "id").collect()[0]
        assert est.m == 1 << HLL_P
        rel = abs(est.est_distinct - n) / n
        assert rel < bound, (n, est.est_distinct, rel)
        # corrected == raw out here (no small-range branch taken)
        assert hll_corrected(est) == est.est_distinct


def test_hll_small_range_correction(spark):
    """Below ~2.5·m distinct the RAW estimator is biased (documented)
    and linear counting over n_zero repairs it: the corrected
    estimate lands within 3σ of the true small cardinality."""
    n = 500
    df = spark.range(n)
    row = hll_distinct(df, "id").collect()[0]
    corrected = hll_corrected(row)
    assert abs(corrected - n) / n < 3 * 1.04 / (1 << HLL_P) ** 0.5
    assert row.n_zero > 0


def test_hll_registers_match_duckdb(spark):
    """The full summary row (registers folded into z_scaled/n_zero +
    the one-division estimate) is BIT-IDENTICAL between the Spark
    implementation and the DuckDB recipe from hll_oracle_sql — the
    exactness contract a catalog entry's hash check relies on."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = hll_distinct(li, "l_partkey").collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = con.execute(hll_oracle_sql("lineitem", "l_partkey")).fetchone()
    con.close()
    assert (got.m, got.n_zero, got.z_scaled) == (want[0], want[1], want[2])
    assert got.est_distinct == want[3]  # bit-exact: one shared division


def test_hll_partition_invariance_and_empty(spark):
    """Same registers under any partitioning (max is order-free);
    empty input → n_zero == m and the pinned-exact estimate 0."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    base = _regs(hll_registers(li, "l_suppkey"))
    assert _regs(hll_registers(li.repartition(13), "l_suppkey")) == base

    empty = li.filter(F.lit(False))
    row = hll_estimate(hll_registers(empty, "l_suppkey")).collect()[0]
    assert row.n_zero == row.m and row.est_distinct == 0.0
    assert row.z_scaled == row.m * (1 << (60 - HLL_P + 1))


# ------------------------------------------------------------ Count-Min


def test_cms_never_underestimates_and_tight(spark):
    """The one-sided CMS guarantee: est >= true count for EVERY
    value, and at N=6k into d=5 rows of w=8192 counters the expected
    overestimate (e/w)·N < 2 — assert a loose integer ceiling."""
    from hadoop_search_spark.operators.sketch import cms_query, cms_sketch

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sk = cms_sketch(li, "l_partkey")
    true = {
        r.l_partkey: r.n
        for r in li.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r.value: r.est
        for r in cms_query(sk, li.select("l_partkey"), "l_partkey").collect()
    }
    assert set(est) == set(true)
    n_total = sum(true.values())
    for v, t in true.items():
        assert est[v] >= t, (v, t, est[v])
        assert est[v] <= t + max(3, int(0.002 * n_total)), (v, t, est[v])


def test_cms_merge_equals_union_sketch(spark):
    """Cell-wise sum merge == sketch of the concatenated multiset —
    exact for a disjoint row split; weighted sketch honors weights."""
    from hadoop_search_spark.operators.sketch import cms_merge, cms_sketch

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    got = {
        (r.row, r.col): r.cnt
        for r in cms_merge(
            cms_sketch(a, "l_partkey"), cms_sketch(b, "l_partkey")
        ).collect()
    }
    want = {
        (r.row, r.col): r.cnt for r in cms_sketch(li, "l_partkey").collect()
    }
    assert got == want

    wsk = cms_sketch(li, "l_partkey", weight_col="l_linenumber")
    wtot = sum(r.cnt for r in wsk.collect())
    assert wtot == 5 * li.agg(F.sum("l_linenumber")).collect()[0][0]


def test_cms_cells_match_duckdb(spark):
    """The full cell table is bit-identical between the Spark sketch
    and the bundled DuckDB recipe — the future oracle contract."""
    from hadoop_search_spark.operators.sketch import cms_oracle_sql, cms_sketch

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        (r.row, r.col): r.cnt for r in cms_sketch(li, "l_partkey").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = {
        (row, col): cnt
        for row, col, cnt in con.execute(
            cms_oracle_sql("lineitem", "l_partkey")
        ).fetchall()
    }
    con.close()
    assert got == want


def test_cms_absent_value_reads_zero(spark):
    """A value never sketched can still collide into nonzero counters
    but a left-join miss must read 0, never NULL; with w >> values a
    fresh probe usually lands on empty cells."""
    from hadoop_search_spark.operators.sketch import cms_query, cms_sketch

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sk = cms_sketch(li, "l_partkey")
    probe = spark.createDataFrame([(999999999,)], "l_partkey BIGINT")
    [r] = cms_query(sk, probe, "l_partkey").collect()
    assert r.est is not None and 0 <= r.est


# ------------------------------------------------------------ grouped HLL


def test_hll_grouped_equals_per_group_sketches(spark):
    """The grouped sketch is exactly the per-group sketches stacked:
    slicing the corpus by source and sketching each slice reproduces
    hll_registers_by's rows; per-group estimates (with the small-range
    correction) land within 3σ of each group's true cardinality."""
    from hadoop_search_spark.operators.sketch import (
        hll_corrected,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    grouped = hll_registers_by(docs, ["source"], "text")
    sources = [r.source for r in docs.select("source").distinct().collect()]
    for s in sources:
        want = _regs(hll_registers(docs.filter(F.col("source") == s), "text"))
        got = {
            (r.register, r.max_rho)
            for r in grouped.filter(F.col("source") == s)
            .select("register", "max_rho")
            .collect()
        }
        assert got == want, s

    bound = 3 * 1.04 / 4096**0.5
    true = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    for row in hll_estimate_by(grouped, ["source"]).collect():
        corrected = hll_corrected(row)
        assert abs(corrected - true[row.source]) / true[row.source] < bound, (
            row.source,
            true[row.source],
            corrected,
        )


# ------------------------------------------------------------ histogram


def test_hist_merge_and_duckdb_parity(spark):
    """Bucket-wise sum merge == sketch of the union; the bucket table
    is bit-identical to the same expression spelled in DuckDB SQL
    (floor((x − lo)/(hi − lo)·B), clamped)."""
    from hadoop_search_spark.operators.sketch import (
        hist_bounds,
        hist_merge,
        hist_sketch,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lo, hi = hist_bounds(li, "l_extendedprice")
    hi += 1e-9  # half-open top: max value clamps into the last bucket
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    got = {
        (r.bucket, r.cnt)
        for r in hist_merge(
            hist_sketch(a, "l_extendedprice", lo, hi),
            hist_sketch(b, "l_extendedprice", lo, hi),
        ).collect()
    }
    want = {
        (r.bucket, r.cnt)
        for r in hist_sketch(li, "l_extendedprice", lo, hi).collect()
    }
    assert got == want

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    sql = f"""
      SELECT least(255, greatest(0, CAST(floor(
               (CAST(l_extendedprice AS DOUBLE) - {lo!r}) / {hi - lo!r} * 256.0
             ) AS BIGINT))) AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1"""
    oracle = {(r, c) for r, c in con.execute(sql).fetchall()}
    con.close()
    assert want == oracle


def test_hist_quantile_bounds_bracket_exact(spark):
    """For every q, the exact rank-q value lies inside the sketch's
    [value_lo, value_hi] bracket, and the bracket is one bucket wide."""
    from hadoop_search_spark.operators.sketch import (
        hist_bounds,
        hist_quantile_bounds,
        hist_sketch,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lo, hi = hist_bounds(li, "l_extendedprice")
    hi += 1e-9
    sk = hist_sketch(li, "l_extendedprice", lo, hi)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    out = {r.q: r for r in hist_quantile_bounds(sk, qs, lo, hi).collect()}
    import math

    for q in qs:
        row = out[q]
        exact = vals[math.ceil(q * len(vals)) - 1]  # rank-q, 1-based
        assert row.n == len(vals) and row.rank == math.ceil(q * len(vals))
        assert row.value_lo <= exact <= row.value_hi, (q, exact, row)
        assert abs((row.value_hi - row.value_lo) - (hi - lo) / 256) < 1e-6


# --------------------------------------------------- r8 edge-case guards


def test_small_p_alpha_uses_tabulated_constants(spark):
    """p=4..6 (m=16/32/64) must use Flajolet's tabulated α, not the
    m>=128 closed form (r7 ADVICE) — and the estimate at p=4 still
    lands inside the (loose, 1.04/√16 ≈ 26%) 3σ bound on a small
    exact-cardinality fixture."""
    from hadoop_search_spark.operators.sketch import _alpha

    assert _alpha(16) == 0.673
    assert _alpha(32) == 0.697
    assert _alpha(64) == 0.709
    assert abs(_alpha(128) - 0.7213 / (1.0 + 1.079 / 128)) < 1e-12

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    row = hll_distinct(li, "l_partkey", p=4).collect()[0]
    est = hll_corrected(row, p=4)
    assert abs(est - exact) <= 3 * 1.04 / 4.0 * exact


def test_merge_guards_reject_mismatched_columns(spark):
    """The grouped-merge footgun (r7 ADVICE): merging GROUPED register
    tables through the ungrouped merges must raise, not silently
    collapse groups; hll_merge_by preserves them exactly."""
    import pytest

    from hadoop_search_spark.operators.sketch import (
        cms_merge,
        cms_sketch,
        hist_merge,
        hll_merge_by,
        hll_registers_by,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    grouped = hll_registers_by(li, ["l_returnflag"], "l_partkey")
    with pytest.raises(ValueError, match="hll_merge_by"):
        hll_merge(grouped, grouped)
    with pytest.raises(ValueError, match="cell tables"):
        cms_merge(cms_sketch(li, "l_partkey").withColumn("extra", F.lit(1)))
    with pytest.raises(ValueError, match="bucket, cnt"):
        hist_merge(grouped)

    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = {
        (r.l_returnflag, r.register, r.max_rho)
        for r in hll_merge_by(
            ["l_returnflag"],
            hll_registers_by(a, ["l_returnflag"], "l_partkey"),
            hll_registers_by(b, ["l_returnflag"], "l_partkey"),
        ).collect()
    }
    want = {
        (r.l_returnflag, r.register, r.max_rho) for r in grouped.collect()
    }
    assert merged == want


def test_hist_degenerate_range_and_bad_q(spark):
    """Constant column (lo == hi): one bucket 0 holding everything and
    exact point brackets; empty bounds raise a clear error; out-of-
    range quantiles raise instead of silently vanishing (r7 ADVICE)."""
    import pytest

    from hadoop_search_spark.operators.sketch import (
        hist_bounds,
        hist_quantile_bounds,
        hist_sketch,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    const = li.select(F.lit(7.5).alias("v"))
    lo, hi = hist_bounds(const, "v")
    assert (lo, hi) == (7.5, 7.5)
    sk = hist_sketch(const, "v", lo, hi)
    rows = sk.collect()
    assert len(rows) == 1 and rows[0].bucket == 0
    q = hist_quantile_bounds(sk, [0.5], lo, hi).collect()[0]
    assert q.value_lo == q.value_hi == 7.5

    with pytest.raises(ValueError, match="no non-NULL"):
        hist_bounds(li.filter(F.lit(False)), "l_extendedprice")
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        hist_quantile_bounds(sk, [0.5, 1.5], lo, hi)
