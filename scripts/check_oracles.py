#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet fixtures, then
compares row count, column names, and an order-insensitive value
comparison (columns sorted by name, rows sorted by stringified
values, floats compared exactly with a reported max-abs-diff on
mismatch).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df_pandas):
    """Column-name-sorted, row-sorted list of value tuples."""
    cols = sorted(df_pandas.columns)
    out = []
    for _, row in df_pandas[cols].iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if hasattr(v, "item"):
                v = v.item()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return cols, out


def values_equal(a, b) -> tuple[bool, float]:
    """Exact compare; returns (equal, max_float_diff)."""
    if len(a) != len(b):
        return False, float("inf")
    max_diff = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, float("inf")
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb:
                    if not (va != va and vb != vb):  # both-NaN ok
                        max_diff = max(max_diff, abs(va - vb))
            elif va is None and vb is None:
                continue
            elif va != vb:
                return False, float("inf")
    return max_diff == 0.0, max_diff


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
            failures.append(name)
            continue
        scols, svals = canon(sdf)
        ocols, ovals = canon(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} duckdb={ocols}")
            failures.append(name)
            continue
        eq, max_diff = values_equal(svals, ovals)
        if not eq:
            sample = next(
                ((ra, rb) for ra, rb in zip(svals, ovals) if ra != rb), None
            )
            print(
                f"FAIL  {name}: value mismatch max_float_diff={max_diff:.3e} "
                f"sample={sample}"
            )
            failures.append(name)
            continue
        print(
            f"OK    {name}: {len(sdf)} rows [spark {t_spark:.1f}s, duckdb {t_duck:.2f}s]"
        )
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
