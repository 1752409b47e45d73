"""Partitioning utilities.

``spread`` fixes the small-file/CPU-bound mismatch: a 2 MB parquet
file plans as ONE input partition, so an explode/hash-heavy pipeline
(tokenization, shingling, stemming) runs single-threaded no matter
how many cores exist. Repartitioning the *row* stream (cheap — rows
are small) before the CPU-heavy expressions restores full
parallelism.

At 100 TB the input already has more splits than cores, so ``spread``
is a no-op — it only forces a shuffle when the scan is narrower than
the cluster, which is exactly when that shuffle is nearly free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# memo: frozenset of input files -> estimated scan partitions. The
# same fixture tables are scanned by many operators per session; the
# estimate is a pure function of the file set.
_SPLIT_EST_CACHE: dict[frozenset[str], int] = {}


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Estimate how many input partitions the scan under ``df`` plans,
    WITHOUT forcing a physical plan (``df.rdd`` costs a full plan
    translation per call — measurable on hot construction paths).

    ``inputFiles()`` reads the already-cached file index off the
    analyzed plan. Split count is at least the file count; for local
    files (the test/bench fixtures) large files are credited with
    ``size / maxPartitionBytes`` splits, matching Spark's file
    partitioning. Non-file sources return 0 ("unknown, assume
    narrow") — callers then repartition, which is the safe direction.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    key = frozenset(files)
    est = _SPLIT_EST_CACHE.get(key)
    if est is None:
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"
        ).lower()
        try:
            if raw.endswith("mb"):
                max_bytes = int(raw[:-2]) << 20
            else:
                max_bytes = int(raw.removesuffix("b"))
        except ValueError:
            max_bytes = 128 << 20
        est = 0
        for f in files:
            splits = 1
            if f.startswith("file:"):
                try:
                    splits = max(
                        1, -(-os.path.getsize(f.removeprefix("file:")) // max_bytes)
                    )
                except OSError:
                    pass
            est += splits
        _SPLIT_EST_CACHE[key] = est
    return est


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to ``defaultParallelism`` iff the scan plans
    fewer input partitions than cores; otherwise return unchanged."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if _estimated_scan_partitions(df) >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
