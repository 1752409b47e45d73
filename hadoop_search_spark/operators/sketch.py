"""HyperLogLog distinct-count sketch as pure relational algebra.

The mergeable cardinality sketch (Flajolet et al. 2007) re-expressed
so that EVERY step is an exact integer/string expression available in
both Spark and DuckDB — no platform hash, no float folds — making the
register table (and therefore the estimate's numerator/denominator)
bit-identical cross-engine. Spark's own ``approx_count_distinct`` is
also HLL but its hash/registers are engine-private; this one is the
auditable, oracle-checkable twin.

Recipe (precision ``p``, 60-bit md5-prefix hash — the repo's shared
cross-engine hash, ``operators/dedup.md5_int``):

* ``register`` = ``h % 2^p``  (low p bits),
* ``rest``     = ``h div 2^p`` (the remaining ``w = 60 − p`` bits),
* ``rho``      = position of the highest set bit from the top:
  ``w − bitlen(rest) + 1`` with ``bitlen(x) = length(bin(x))`` for
  ``x > 0`` and the all-zero case pinned to ``w + 1`` (``bin(0)`` is
  the 1-char string "0" in both engines, so the CASE is explicit).
* sketch = ``groupBy(register).max(rho)`` — a ≤ 2^p-row table.

Estimation keeps the sum INTEGER: the harmonic-mean denominator
``Z = Σ 2^−rho_j`` is scaled by ``2^(w+1)`` so each term is
``shiftleft(1, w + 1 − rho_j)`` (absent registers contribute the full
``2^(w+1)``), summing to at most ``2^p · 2^(w+1)`` = 2^61 at p=12 —
inside BIGINT, exact in any summation order. The final estimate is
ONE IEEE division of a Python-float literal by that BIGINT, so an SQL
oracle reproduces it bit-for-bit. The standard small-range
linear-counting correction needs ``ln`` (libm — not cross-engine
reproducible), so this module ships the correction INPUTS
(``n_zero``) and leaves the branch to the consumer; at the fixture
cardinalities the raw estimator is already inside its error bound.

Scale shape (the reason this exists): exact ``COUNT(DISTINCT x)``
over 100 TB shuffles every distinct value; the sketch is one narrow
map + ONE p-bit-key aggregation that map-side-combines down to
≤ 2^p rows per partition, constant memory, and sketches of disjoint
corpora (daily snapshots, per-source shards) MERGE by register-wise
max without touching the data again — the property the pipeline's
incremental accounting needs. Standard error ≈ 1.04/√(2^p) (~1.6 %
at p = 12).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_search_spark.operators.dedup import md5_int

HLL_P = 12  # 4096 registers, ~1.6% standard error
_HASH_HEX = 15  # 60-bit hash — the repo's md5_int budget (fits BIGINT)


def _alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. §4): the closed form
    holds for m ≥ 128; the small register counts the p=4..6 corner of
    the supported range produces use the paper's tabulated constants
    (r7 ADVICE: the closed form silently overestimated α there)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers_by(
    df: DataFrame, group_cols: list[str], col: str, p: int = HLL_P
) -> DataFrame:
    """Sketch a column per group → ``(*group_cols, register,
    max_rho)``, ≤ 2^p rows PER GROUP. The ONLY aggregation is ``max``
    over a (group, p-bit) key: order-independent, partition-
    invariant, map-side combined — and two sketches merge by the same
    aggregation (:func:`hll_merge`). NULLs are skipped (COUNT
    DISTINCT semantics). With ``group_cols=[]`` this is the plain
    corpus sketch (:func:`hll_registers`); with a source/shard/day
    column it is the datacard's per-group distinct accounting —
    |groups|·2^p rows of state instead of |groups|·|distinct values|."""
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} out of the sane 4..18 range")
    m = 1 << p
    w = 60 - p
    h = md5_int(F.col(col).cast("string"), _HASH_HEX)
    # integral h div 2^p as a shift — h/m through DOUBLE would lose
    # bits above 2^53 (h is 60-bit); shiftright on BIGINT is exact
    rest = F.shiftright(h, p)
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rest))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols,
            (h % F.lit(m)).cast("bigint").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_registers(
    df: DataFrame, col: str, p: int = HLL_P
) -> DataFrame:
    """Sketch a column → ``(register, max_rho)``, ≤ 2^p rows — the
    ungrouped form of :func:`hll_registers_by`."""
    return hll_registers_by(df, [], col, p)


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables (same p) → one register table: union +
    register-wise max. Sketch(A ∪ B) == merge(sketch(A), sketch(B))
    EXACTLY — max commutes with union — which is what makes per-shard
    /per-day sketches composable without rescanning data."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    for s in sketches:
        # the r7-ADVICE footgun: merging GROUPED register tables here
        # would silently max-merge ACROSS groups (one collapsed sketch
        # instead of per-group sketches)
        if set(s.columns) != {"register", "max_rho"}:
            raise ValueError(
                "hll_merge merges UNGROUPED sketches (register, "
                f"max_rho); got columns {s.columns} — merge grouped "
                "sketches with hll_merge_by(group_cols, ...)"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_merge_by(group_cols: list[str], *sketches: DataFrame) -> DataFrame:
    """Merge GROUPED register tables (:func:`hll_registers_by`, same
    p and group columns) preserving the groups: union + per-(group,
    register) max — sketch_by(A ∪ B) == merge_by(sketch_by(A),
    sketch_by(B)) exactly, groupwise."""
    if not sketches:
        raise ValueError("hll_merge_by needs at least one sketch")
    want = set(group_cols) | {"register", "max_rho"}
    for s in sketches:
        if set(s.columns) != want:
            raise ValueError(
                f"hll_merge_by({group_cols}) expects columns {sorted(want)}; "
                f"got {s.columns}"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(sketch: DataFrame, p: int = HLL_P) -> DataFrame:
    """Estimate from a register table → one row ``(m, n_zero,
    z_scaled, est_distinct)``:

    * ``z_scaled`` = Σ_j 2^(w+1−rho_j) over ALL m registers (absent
      ⇒ rho 0 ⇒ full 2^(w+1)) — an exact BIGINT;
    * ``est_distinct`` = α_m · m² · 2^(w+1) / z_scaled — the raw HLL
      estimator as ONE float division of a constant (bit-identical
      cross-engine);
    * ``n_zero`` (registers never hit) is the linear-counting input
      for consumers that apply the small-range correction
      (m·ln(m/n_zero) — ln is libm, deliberately not computed here).
    """
    m = 1 << p
    w = 60 - p
    # SQL form: the Python F.shiftleft wrapper wants a literal int
    # for numBits; the engine function takes any integral expression
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - max_rho)")
    agg = sketch.agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.coalesce(F.sum(term), F.lit(0)).cast("bigint").alias("z_present"),
    )
    numer = _alpha(m) * m * m * float(1 << (w + 1))
    n_zero = F.lit(m) - F.col("n_present")
    z = F.col("z_present") + n_zero * F.lit(1 << (w + 1)).cast("bigint")
    est = F.when(F.col("n_present") == 0, F.lit(0.0)).otherwise(
        F.lit(numer) / z.cast("double")
    )
    return agg.select(
        F.lit(m).cast("bigint").alias("m"),
        n_zero.cast("bigint").alias("n_zero"),
        z.cast("bigint").alias("z_scaled"),
        # raw estimator; empty sketch pinned to the exactly-known 0
        # (the α·m the raw formula yields there is a small-range
        # artifact linear counting would fix)
        est.alias("est_distinct"),
    )


def hll_estimate_by(
    sketch: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group estimate from a grouped register table
    (:func:`hll_registers_by`) → one row per group ``(*group_cols, m,
    n_zero, z_scaled, est_distinct)`` — the same exact-integer
    z_scaled and single-division estimator as :func:`hll_estimate`,
    keyed by the group columns. A group appears iff it had at least
    one non-NULL value (its sketch has ≥ 1 register), so n_present
    ≥ 1 and the empty-sketch pin is unreachable here."""
    m = 1 << p
    w = 60 - p
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - max_rho)")
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.sum(term).cast("bigint").alias("z_present"),
    )
    numer = _alpha(m) * m * m * float(1 << (w + 1))
    n_zero = F.lit(m) - F.col("n_present")
    z = F.col("z_present") + n_zero * F.lit(1 << (w + 1)).cast("bigint")
    return agg.select(
        *group_cols,
        F.lit(m).cast("bigint").alias("m"),
        n_zero.cast("bigint").alias("n_zero"),
        z.cast("bigint").alias("z_scaled"),
        (F.lit(numer) / z.cast("double")).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = HLL_P
) -> DataFrame:
    """sketch + estimate in one call → the one-row summary."""
    return hll_estimate(hll_registers(df, col, p), p)


def hll_corrected(row, p: int = HLL_P) -> float:
    """Apply Flajolet's small/large-range corrections to a collected
    :func:`hll_estimate` row — DRIVER-side Python on the one summary
    row, deliberately outside the cross-engine-hashed columns because
    ``ln`` is libm (not bit-reproducible between engines). Linear
    counting m·ln(m/n_zero) when the raw estimate is under 2.5·m and
    zero registers remain; the raw estimate otherwise (the 60-bit
    hash space makes the 2^32 large-range correction unreachable)."""
    import math

    m = 1 << p
    if row.est_distinct <= 2.5 * m and row.n_zero > 0:
        return m * math.log(m / row.n_zero)
    return float(row.est_distinct)


def hll_registers_sql(table: str, col: str, p: int = HLL_P) -> str:
    """DuckDB twin of :func:`hll_registers` — the h/regs/sk CTE chain
    (no trailing SELECT), single-sourced so the register recipe can
    never drift between the summary oracle, the streaming-replay
    oracle, and the tests."""
    m = 1 << p
    w = 60 - p
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, {_HASH_HEX}))::BIGINT AS hv
  FROM {table} WHERE {col} IS NOT NULL
),
regs AS (
  SELECT hv % {m} AS register,
         CASE WHEN hv // {m} = 0 THEN {w + 1}
              ELSE {w + 1} - length(bin(hv // {m})) END AS rho
  FROM h
),
sk AS (SELECT register, MAX(rho) AS max_rho FROM regs GROUP BY register)"""


def hll_grouped_oracle_sql(
    table: str, group_col: str, col: str, p: int = HLL_P
) -> str:
    """DuckDB twin of :func:`hll_estimate_by` over one group column —
    the per-group register chain + the same exact-integer z and
    single-division estimate (no empty-pin branch: a group exists iff
    it has >= 1 register)."""
    m = 1 << p
    w = 60 - p
    numer = repr(_alpha(m) * m * m * float(1 << (w + 1)))
    return f"""
WITH h AS (
  SELECT {group_col},
         ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, {_HASH_HEX}))::BIGINT AS hv
  FROM {table} WHERE {col} IS NOT NULL
),
regs AS (
  SELECT {group_col}, hv % {m} AS register,
         CASE WHEN hv // {m} = 0 THEN {w + 1}
              ELSE {w + 1} - length(bin(hv // {m})) END AS rho
  FROM h
),
sk AS (SELECT {group_col}, register, MAX(rho) AS max_rho
       FROM regs GROUP BY {group_col}, register),
agg AS (
  SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << ({w + 1} - max_rho)) AS BIGINT) AS z_present
  FROM sk GROUP BY {group_col}
)
SELECT {group_col},
       CAST({m} AS BIGINT) AS m,
       CAST({m} - n_present AS BIGINT) AS n_zero,
       CAST(z_present + ({m} - n_present) * (CAST(1 AS BIGINT) << {w + 1}) AS BIGINT) AS z_scaled,
       {numer} / CAST(z_present + ({m} - n_present) * (CAST(1 AS BIGINT) << {w + 1}) AS DOUBLE) AS est_distinct
FROM agg
"""


def hll_oracle_sql(table: str, col: str, p: int = HLL_P) -> str:
    """The DuckDB twin of :func:`hll_distinct` — the exact same
    recipe spelled in SQL (shared single source for tests and the
    catalog oracle, so the two can never drift apart)."""
    m = 1 << p
    w = 60 - p
    numer = repr(_alpha(m) * m * m * float(1 << (w + 1)))
    return hll_registers_sql(table, col, p) + f""",
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_present,
         CAST(coalesce(sum(CAST(1 AS BIGINT) << ({w + 1} - max_rho)), 0) AS BIGINT) AS z_present
  FROM sk
)
SELECT CAST({m} AS BIGINT) AS m,
       CAST({m} - n_present AS BIGINT) AS n_zero,
       CAST(z_present + ({m} - n_present) * (CAST(1 AS BIGINT) << {w + 1}) AS BIGINT) AS z_scaled,
       CASE WHEN n_present = 0 THEN 0.0
            ELSE {numer} / CAST(z_present + ({m} - n_present) * (CAST(1 AS BIGINT) << {w + 1}) AS DOUBLE)
       END AS est_distinct
FROM agg
"""


# ------------------------------------------------------------ Count-Min

CMS_D = 5      # hash rows: P(all rows collide) decays as e^-d
CMS_W = 8192   # counters per row: overestimate <= (e/w)·N w.h.p.


def _cms_col(col: F.Column, i: int, w: int) -> F.Column:
    """Row-i counter index: the bloom_decontaminate seed-salt recipe
    ('cms{i}:' prefix into the shared md5 hash, 48-bit budget) modulo
    the row width — exact in both engines."""
    return md5_int(F.concat(F.lit(f"cms{i}:"), col.cast("string")), 12) % F.lit(w)


def cms_sketch(
    df: DataFrame,
    col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of a column → ``(row, col, cnt)``, ≤ d·w
    cells: the mergeable FREQUENCY companion to :func:`hll_registers`
    (cardinality). Each value increments one counter per hash row;
    ``weight_col`` (optional BIGINT) turns it into a weighted sketch.
    All arithmetic is integer and the per-row hash is the shared
    md5 recipe, so the cell table is bit-identical cross-engine.

    Scale shape: one map-only explode (a fixed ×d row cost) + ONE
    aggregation that map-side-combines down to ≤ d·w cells per
    partition — constant memory at any corpus size, and sketches of
    disjoint shards merge by cell-wise SUM (:func:`cms_merge`) —
    exact, since each input row lands in exactly one shard. Unlike
    the HLL max-merge, sum-merge is NOT replay-idempotent: a
    streaming maintainer must fence replays with an epoch ledger
    (the standard protocol), not algebra."""
    c = F.col(col)
    wgt = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                _cms_col(c, i, w).cast("bigint").alias("col"),
            )
            for i in range(d)
        ]
    )
    return (
        df.filter(c.isNotNull())
        .select(F.explode(cells).alias("cell"), wgt.alias("_w"))
        .groupBy(
            F.col("cell.row").alias("row"), F.col("cell.col").alias("col")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge cell tables (same d, w) by cell-wise sum:
    sketch(A ⊎ B) == merge(sketch(A), sketch(B)) exactly for a
    disjoint row split (multiset union)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    for s in sketches:
        # same footgun class as hll_merge: extra key columns would be
        # silently summed away
        if set(s.columns) != {"row", "col", "cnt"}:
            raise ValueError(
                f"cms_merge expects (row, col, cnt) cell tables; got "
                f"columns {s.columns}"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    values: DataFrame,
    col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-query a batch of values → ``(value, est)`` with
    ``est = min over the d rows`` of the addressed counters — the
    classic one-sided estimate: NEVER below the true count, above it
    only when every row collides. Values absent from the sketch read
    counter 0 rows as 0 via the left join's coalesce.

    The sketch is ≤ d·w rows (a few hundred KB) — broadcast side of
    the join; the values side can be any size."""
    v = F.col("value")
    addr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                _cms_col(v, i, w).cast("bigint").alias("col"),
            )
            for i in range(d)
        ]
    )
    probes = (
        values.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("value"))
        .distinct()
        .select("value", F.explode(addr).alias("cell"))
        .select("value", F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    )
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est")
    )


def cms_oracle_sql(table: str, col: str, d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB twin of :func:`cms_sketch`'s cell table (single source
    for tests and a future catalog oracle)."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, "
        f"('0x' || substr(md5('cms{i}:' || CAST({col} AS VARCHAR)), 1, 12))::BIGINT % {w} AS col, "
        f"CAST(1 AS BIGINT) AS c "
        f"FROM {table} WHERE {col} IS NOT NULL"
        for i in range(d)
    )
    return f"""
WITH cells AS (
{rows}
)
SELECT row, col, CAST(sum(c) AS BIGINT) AS cnt
FROM cells GROUP BY row, col
"""


def cms_pointq_oracle_sql(
    table: str, col: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB twin of :func:`cms_query` probing every distinct value
    of the sketched column itself — (value, est) with est = min over
    the d addressed counters (coalesced 0 on an un-hit cell)."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, "
        f"('0x' || substr(md5('cms{i}:' || CAST({col} AS VARCHAR)), 1, 12))::BIGINT % {w} AS col, "
        f"CAST(1 AS BIGINT) AS c "
        f"FROM {table} WHERE {col} IS NOT NULL"
        for i in range(d)
    )
    addr = "\nUNION ALL\n".join(
        f"SELECT value, {i} AS row, "
        f"('0x' || substr(md5('cms{i}:' || CAST(value AS VARCHAR)), 1, 12))::BIGINT % {w} AS col "
        f"FROM vals"
        for i in range(d)
    )
    return f"""
WITH cells AS (
{rows}
),
sk AS (SELECT row, col, CAST(sum(c) AS BIGINT) AS cnt
       FROM cells GROUP BY row, col),
vals AS (SELECT DISTINCT {col} AS value FROM {table}
         WHERE {col} IS NOT NULL),
addr AS (
{addr}
)
SELECT a.value, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
FROM addr a LEFT JOIN sk s ON s.row = a.row AND s.col = a.col
GROUP BY a.value
"""


# ---------------------------------------------------------- histogram

HIST_BUCKETS = 256


def hist_bounds(df: DataFrame, col: str) -> tuple[float, float]:
    """One min/max aggregate → the sketch's value range (the
    compact_zorder ranges pattern: a model-sized driver collect)."""
    row = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    if row.lo is None:
        # r7 ADVICE: float(None) raised a bare TypeError here
        raise ValueError(
            f"hist_bounds({col!r}): no non-NULL values to bound"
        )
    return float(row.lo), float(row.hi)


def _hist_bucket(col: F.Column, lo: float, hi: float, buckets: int) -> F.Column:
    """Equi-width bucket id, clamped to [0, buckets−1]. The index is
    one multiply + one divide + one floor on doubles — each correctly
    rounded IEEE, identical cross-engine when spelled identically
    (the SQL twin uses the same expression order)."""
    if hi == lo:
        # degenerate range (constant column, r7 ADVICE): every value
        # clamps into bucket 0 — rank math stays correct, the value
        # bracket collapses to the exact point [lo, lo]
        return F.lit(0).cast("bigint")
    raw = F.floor(
        (col.cast("double") - F.lit(lo))
        / F.lit(hi - lo)
        * F.lit(float(buckets))
    ).cast("bigint")
    return F.least(F.lit(buckets - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw))


def hist_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """Equi-width histogram sketch → ``(bucket, cnt)``, ≤ ``buckets``
    rows — the QUANTILE member of the sketch family (HLL: distinct,
    CMS: frequency): constant-size, mergeable by bucket-wise SUM over
    disjoint shards, and any quantile answers from the cumulative
    counts with rank error bounded by the heaviest bucket's mass
    (value error by the bucket width). NULLs are skipped; values
    outside [lo, hi) clamp into the edge buckets (the bounds come
    from :func:`hist_bounds` or domain knowledge — a later shard
    exceeding them degrades the edge bucket's value bound, never
    correctness of the rank math). Like CMS (and unlike HLL), SUM
    merge is not replay-idempotent — a streaming maintainer needs the
    ledger fence."""
    if hi < lo:
        raise ValueError(f"need hi >= lo, got [{lo}, {hi}]")
    return (
        df.filter(F.col(col).isNotNull())
        .select(_hist_bucket(F.col(col), lo, hi, buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histograms (same lo/hi/buckets) by bucket-wise sum."""
    if not sketches:
        raise ValueError("hist_merge needs at least one sketch")
    for s in sketches:
        if set(s.columns) != {"bucket", "cnt"}:
            raise ValueError(
                f"hist_merge expects (bucket, cnt) tables; got "
                f"columns {s.columns}"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantile_bounds(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """Quantile brackets from a histogram → ``(q, bucket, value_lo,
    value_hi, rank, n)``: for each q, the bucket where the cumulative
    count first reaches ``rank = ceil(q·n)`` — the TRUE rank-q value
    provably lies inside [value_lo, value_hi] (pinned by test against
    exact percentiles). One window over ≤ ``buckets`` rows; the
    bracket endpoints are the same two-flop expressions in the SQL
    twin."""
    bad = [q for q in qs if not 0.0 <= float(q) <= 1.0]
    if bad:
        # r7 ADVICE: a q outside [0,1] produced rank > n, matched no
        # bucket, and silently VANISHED from the output
        raise ValueError(f"quantiles must be in [0, 1]; got {bad}")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(
            sketch.agg(F.sum("cnt").cast("bigint").alias("n"))
        )
    )
    # literal pick-list via range(), not createDataFrame: the latter
    # plans as Scan ExistingRDD with UNDEFINED maxRows, failing the
    # catalog's provably-bounded-broadcast gate; Range carries
    # maxRows = len(qs) through the Project
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    q_df = sketch.sparkSession.range(len(qs)).select(
        F.element_at(qarr, (F.col("id") + 1).cast("int")).alias("q")
    )
    ranked = cum.crossJoin(F.broadcast(q_df)).withColumn(
        "rank", F.ceil(F.col("q") * F.col("n")).cast("bigint")
    )
    width = (hi - lo) / buckets
    hit = (
        ranked.filter(F.col("cum") >= F.col("rank"))
        .groupBy("q", "rank", "n")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(
        "q",
        "bucket",
        (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("value_lo"),
        (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("value_hi"),
        "rank",
        "n",
    )
