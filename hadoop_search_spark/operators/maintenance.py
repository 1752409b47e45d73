"""Data-layout maintenance — the lakehouse OPTIMIZE concern.

Continuous ingestion (streaming index/dedup publishes, micro-batch
appends) accretes small files; at 100 TB the small-files problem is a
first-order cost: every scan pays per-file open/footer overhead, and
min/max pruning degrades when row groups interleave key ranges.
``compact`` rewrites a parquet dataset into ~``target_bytes`` files,
optionally range-clustered on a key so each output file owns a
contiguous key range (restoring pushed-down point/range pruning —
the same property `write_corpus`/`write_index` establish at build
time).

The output file count derives from the dataset's ON-DISK size (via
the Hadoop FileSystem API, so it works on any FS Spark can read),
not a row count — compression ratio is already priced in.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` (any Hadoop-visible FS)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(p).getLength())


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    cluster_key: str | None = None,
) -> tuple[int, DataFrame]:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with
    ~``target_bytes``-sized files; returns (n_files, compacted frame).

    With ``cluster_key`` the rewrite range-partitions on the key, so
    each output file covers a contiguous key range and scans filtering
    on the key prune whole files via footer min/max. Without it the
    rewrite is a plain round-robin repartition (pure size fix).

    ``dst`` must differ from ``src`` — readers of a live dataset keep
    working against the old files until a pointer/manifest flip
    publishes the compacted copy (the versioned-directory protocol of
    ``streaming/index_ingest.py``; a table format makes this a
    transactional REPLACE)."""
    if src == dst:
        raise ValueError("compact to a new location, then swap pointers")
    n = max(1, math.ceil(dataset_bytes(spark, src) / target_bytes))
    df = spark.read.parquet(src)
    if cluster_key is not None:
        out = df.repartitionByRange(n, cluster_key).sortWithinPartitions(
            cluster_key
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n, spark.read.parquet(dst)
