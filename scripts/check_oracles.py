#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet fixtures, then
compares row count, column names, RESULT TYPES, and an
order-insensitive value comparison (columns sorted by name, rows
sorted by stringified values, floats compared exactly with a reported
max-abs-diff on mismatch).

The type check exists because the driver's value hash is
TYPE-sensitive while pandas-converted values are not: for three
rounds this gate reported "0 failures" while the driver hashed four
entries red, and the cause was DuckDB HUGEINT (int128, from an uncast
integer ``sum()``) against Spark int64 at equal values. The gate now
compares the DuckDB relation's resolved types against the Spark
schema per column: HUGEINT/UHUGEINT anywhere is a hard FAIL, as is
any cross-class disagreement (integer vs float vs decimal vs other,
or a decimal precision/scale mismatch); integer-width differences
inside int64 (INT vs BIGINT) are reported as warnings since the
driver's Arrow serialization has never distinguished them.

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


_INT_CLASSES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",  # duckdb
    "tinyint", "smallint", "int", "bigint",  # spark
}
_FLOAT_CLASSES = {"FLOAT", "REAL", "DOUBLE", "float", "double"}


_INT_WIDTH = {
    "tinyint": 8, "smallint": 16, "int": 32, "integer": 32, "bigint": 64,
}


def _int_width(t: str) -> int:
    return _INT_WIDTH[t.strip().lower()]


def _type_class(t: str) -> str:
    """Coarse cross-engine type class for a Spark dtype string or a
    DuckDB type string. Decimals keep (precision,scale) — a scale
    disagreement changes the serialized value."""
    base = t.strip()
    low = base.lower()
    if "hugeint" in low:
        return "HUGEINT"
    if low.startswith("decimal"):
        return "decimal" + low[len("decimal"):].replace(" ", "")
    if base in _INT_CLASSES:
        return "int"
    if base in _FLOAT_CLASSES:
        return "float"
    if low in ("varchar", "string", "text"):
        return "str"
    if low in ("boolean", "bool"):
        return "bool"
    return low


def type_mismatches(spark_dtypes, duck_cols, duck_types):
    """Returns (hard_failures, warnings) comparing per-column type
    classes between the Spark schema and the DuckDB relation."""
    sd = {c: t for c, t in spark_dtypes}
    hard, warn = [], []
    for c, dt in zip(duck_cols, duck_types):
        dts = str(dt)
        dcls = _type_class(dts)
        if dcls == "HUGEINT":
            hard.append(f"{c}: duckdb {dts} (uncast integer sum()? CAST AS BIGINT)")
            continue
        if c not in sd:
            continue  # column-name check reports this separately
        scls = _type_class(sd[c])
        if scls != dcls:
            hard.append(f"{c}: spark {sd[c]} vs duckdb {dts}")
        elif scls == "int" and _int_width(sd[c]) != _int_width(dts):
            # same class, different width — the driver's hash has never
            # distinguished these; surface but don't fail
            warn.append(f"{c}: spark {sd[c]} vs duckdb {dts} (int width)")
    return hard, warn


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
            spark_df = fn(spark, SF_DIR)
            spark_dtypes = spark_df.dtypes
            sdf = spark_df.toPandas()
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
            rel = con.sql(oracles[name])
            duck_cols, duck_types = list(rel.columns), list(rel.types)
            odf = rel.fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        # the driver's value hash is type-sensitive; pandas values are
        # not — check resolved types BEFORE the value compare so the
        # local gate can see the one failure class values can't show
        hard, warn = type_mismatches(spark_dtypes, duck_cols, duck_types)
        for w in warn:
            print(f"WARN  {name}: {w}")
        if hard:
            print(f"FAIL  {name}: result-type mismatch: {'; '.join(hard)}")
            failures.append(name)
            continue
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
