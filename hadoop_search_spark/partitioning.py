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

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to ``defaultParallelism`` iff the current plan
    has fewer partitions than cores; otherwise return unchanged."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
