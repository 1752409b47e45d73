#!/usr/bin/env python3
"""Dump ``.explain("formatted")`` for catalog entries to per-query
files — the optimization-round evidence trail (plans/r<N>/<query>_<tag>.txt).

Usage:
    python scripts/explain_catalog.py <out_dir> <tag> [entry ...]

With no entries listed, dumps the bench HEADLINE set. Runs at sf0.01
(plan SHAPE is sf-independent; only AQE's runtime re-planning sees
sizes, and explain() before execution shows the initial plan either
way).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from hadoop_search_spark.session import get_spark

    spark = get_spark(app_name="explain_catalog", cpus=8, shuffle_partitions=8)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        # private API is the only way to get the formatted string
        # without capturing stdout; same string explain() prints
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
