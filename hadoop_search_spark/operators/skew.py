"""Skew-handling utilities (ARCHITECTURE.md "Scale design").

AQE's skew-join splitting handles most runtime skew; these utilities
cover the two patterns AQE cannot fix by itself:

* **salted aggregation** — a groupBy on a key with a few runaway-hot
  values (a viral term, a bot user) funnels the hot key through one
  reducer. Two-phase aggregation over a salted key spreads phase one
  across ``salt_n`` partitions; phase two combines the tiny partials.
  Semantics-neutral for any algebraic aggregate.
* **salted broadcast-side join** — when the *build* side is small but
  the probe side is hot on a few keys, replicating the small side
  ``salt_n``× and salting the big side's key spreads the probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt_n: int) -> Column:
    """Deterministic per-row salt: a hash over every column mod salt_n.

    Determinism matters under task retries — a salt derived from
    partition ids or monotonically_increasing_id changes when a lost
    task recomputes, which can double-count or drop rows in the
    two-phase aggregate. The trade-off: rows identical in every
    column share a salt (a hot key of *byte-identical* rows still
    funnels); real data distinguishes rows by some column."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_n))


def salted_count(df: DataFrame, key_cols: list[str], salt_n: int = 16) -> DataFrame:
    """groupBy(key).count() with two-phase salting: phase one counts
    per (key, salt) — hot keys spread over ``salt_n`` reducers — phase
    two sums the ≤``salt_n`` partials per key."""
    salt = _row_salt(df, salt_n)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("cnt"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value: Column, salt_n: int = 16
) -> DataFrame:
    """Two-phase salted sum; same shape as :func:`salted_count`."""
    salt = _row_salt(df, salt_n)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("sum_value"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side against a small side by replicating the
    small side ``salt_n``× (explode over salt values) and salting the
    big side's key — every hot key's rows spread over ``salt_n``
    partitions instead of one.

    Output columns = big's + small's (minus the duplicate key), like a
    plain ``big.join(small, key, how)``. Only inner/left semantics are
    valid — right/full would multiply the replicated small side."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(salt_n)])
    big_salted = big.withColumn("_salt", _row_salt(big, salt_n))
    small_salted = small.withColumn("_salt", F.explode(salts))
    return big_salted.join(small_salted, [key, "_salt"], how).drop("_salt")
