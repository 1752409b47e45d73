#!/usr/bin/env python3
"""DuckDB baseline for the bench headline set — runs each headline
query's own ``oracle_sql()`` (the exact SQL the correctness gate
compares against) at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line in the same shape as
``bench.py``, so the 2x target in BASELINE.md is reproducible:

    python bench.py                 # Spark side
    python scripts/bench_duckdb.py  # baseline side

Queries with no oracle (stemmed CNF search) are skipped and listed in
the output. Same methodology as bench.py: results fully materialized,
an untimed warm-up pass, then a timed steady-state pass. Since r6 the
timed pass materializes via ``.arrow()`` — the SAME Arrow columnar
transfer bench.py switched to in r5 — so neither side pays Python
tuple-construction costs the other skips; ``fetchall_total`` records
the old row-materialization timing once for series continuity
(r1–r5 baselines were fetchall-timed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    import duckdb

    from bench import HEADLINE
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    oracles = entry.oracle_sql()
    runnable = [q for q in HEADLINE if q in oracles]
    skipped = [q for q in HEADLINE if q not in oracles]

    for name in runnable:  # warm-up: buffer pool + parquet metadata
        con.execute(oracles[name]).arrow()

    timings: dict[str, float] = {}
    for name in runnable:
        t0 = time.time()
        tbl = con.execute(oracles[name]).arrow()
        timings[name] = round(time.time() - t0, 3)
        print(
            f"# {name}: {timings[name]}s ({tbl.num_rows} rows)",
            file=sys.stderr,
        )

    # one fetchall pass for continuity with the r1-r5 recordings
    # (Python-tuple materialization, the old timed path)
    fetchall_total = 0.0
    for name in runnable:
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        fetchall_total += time.time() - t0

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_sequential",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "materialization": "arrow",
                "fetchall_total": round(fetchall_total, 3),
                "skipped_no_oracle": skipped,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
