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
from pyspark.sql import functions as F

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


def apply_changes(
    corpus: DataFrame, changes: DataFrame, op_col: str = "op", key: str = "doc_id"
) -> DataFrame:
    """MERGE a change set into a corpus snapshot (the lakehouse
    upsert/delete concern, without a table format): ``changes`` rows
    carry ``op`` ∈ {'upsert', 'delete'} plus the full corpus schema;
    the result is the corpus with deleted keys removed, upserted keys
    replaced, and new upserted keys inserted.

    Plan shape: ONE left-anti shuffle join of the corpus against the
    change keys (drops both deletes and to-be-replaced rows in the
    same pass) + a union of the upsert payloads — no full outer join,
    no window, and the corpus is never shuffled twice. The change set
    is usually ingest-sized (millions) against a corpus of billions:
    when it fits the broadcast threshold, AQE turns the anti join
    into a broadcast hash join and the corpus scan is map-only.

    Unknown ``op`` values fail at execution time via a lazy guard
    folded into the anti-join key (an eager driver-side validation
    would cost a full change-set scan at plan-construction time, and
    a guard on a separate column would be pruned away).

    Contract: at most ONE change row per key. A key appearing twice
    (two upserts, or delete + upsert) would emit every upsert payload
    — last-writer-wins must be resolved upstream (e.g. a max_by over
    the change log's sequence number), where the ordering information
    lives; this operator cannot invent it.
    """
    payload_cols = [c for c in changes.columns if c != op_col]
    op = F.col(op_col)
    guarded_key = (
        F.when(op.isin("upsert", "delete"), F.col(key))
        .otherwise(
            F.raise_error(F.concat(F.lit("unknown op in change set: "), op))
        )
        .alias(key)
    )
    survivors = corpus.join(changes.select(guarded_key), key, "left_anti")
    upserts = changes.filter(op == "upsert").select(*payload_cols)
    return survivors.unionByName(upserts)


def merge_publish(
    spark: SparkSession,
    corpus_path: str,
    changes: DataFrame,
    partition_col: str,
    op_col: str = "op",
    key: str = "doc_id",
) -> list:
    """Incremental MERGE into a hive-partitioned parquet corpus:
    rewrite ONLY the partitions the change set touches, leaving the
    rest of the dataset untouched on disk → returns the list of
    partition values rewritten.

    This is the 100 TB shape of :func:`apply_changes`: at scale the
    snapshot-and-rewrite formulation re-writes the whole corpus for a
    0.1% change set, while dynamic partition overwrite
    (``partitionOverwriteMode=dynamic``) replaces exactly the
    partitions present in the written frame. The read side prunes to
    the affected partitions too (partition filter on
    ``partition_col``), so the merge cost is proportional to the
    touched data, not the corpus.

    The change set must carry ``partition_col``; a changed row's
    partition is assumed stable (moving a row between partitions is a
    delete in one + an upsert in the other).
    """
    parts = [r[0] for r in changes.select(partition_col).distinct().collect()]
    if not parts:
        return []
    corpus = spark.read.parquet(corpus_path).filter(
        F.col(partition_col).isin(parts)
    )
    # localCheckpoint cuts the read-from-the-write-target lineage
    # (Spark refuses a self-overwrite it can trace) and bounds the
    # materialization to the touched partitions only
    merged = apply_changes(corpus, changes, op_col=op_col, key=key).localCheckpoint()
    saved_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            corpus_path
        )
    finally:
        if saved_mode is not None:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", saved_mode
            )
        else:
            # get(..., None) returns None for a never-set conf; leaving
            # 'dynamic' behind would silently turn later full-snapshot
            # overwrites in this session into partial ones
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    # dynamic overwrite only replaces partitions PRESENT in the written
    # frame — a partition whose every row was deleted writes nothing
    # and would keep its stale files; drop those directories explicitly
    live = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for p in set(parts) - live:
        dir_path = jvm.org.apache.hadoop.fs.Path(
            f"{corpus_path}/{partition_col}={p}"
        )
        fs = dir_path.getFileSystem(conf)
        if fs.exists(dir_path):
            fs.delete(dir_path, True)
    return sorted(parts)


ZORDER_BITS = 8  # per-column resolution: 256 buckets


def zorder_key(cols: list[str], ranges: dict[str, tuple[float, float]]) -> F.Column:
    """Morton (Z-order) key over ``cols``: each column maps to a
    ZORDER_BITS-bit equal-width bucket inside its [min, max] range,
    and the buckets' bits interleave — a pure integer Catalyst
    expression (shifts unrolled per bit), no UDF.

    Interleaving is what makes MULTI-column file pruning work: sorting
    by (a, b) clusters a perfectly but lets b span its full range in
    every file; sorting by z(a, b) bounds every file to a small
    rectangle in (a, b) space, so parquet footer min/max prune files
    for predicates on EITHER column."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least two columns")
    if n * ZORDER_BITS > 63:
        # bit 63 is the BIGINT sign bit and shiftleft wraps its count
        # mod 64 — either silently corrupts the key ordering
        raise ValueError(
            f"zorder over {n} columns needs {n * ZORDER_BITS} bits; "
            "max 63 at ZORDER_BITS=8 (7 columns)"
        )
    z = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        lo, hi = ranges[c]
        span = float(hi - lo) or 1.0
        bucket = F.least(
            F.lit((1 << ZORDER_BITS) - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(c).cast("double") - F.lit(float(lo)))
                    / F.lit(span)
                    * F.lit(1 << ZORDER_BITS)
                ).cast("bigint"),
            ),
        )
        for bit in range(ZORDER_BITS):
            src = F.shiftright(bucket, bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(src, bit * n + (n - 1 - ci)).cast("bigint")
            )
    return z


def compact_zorder(
    spark: SparkSession,
    src: str,
    dst: str,
    zorder_by: list[str],
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> tuple[int, DataFrame]:
    """Multi-column variant of :func:`compact`: rewrite the dataset
    range-partitioned and sorted on a Morton key over ``zorder_by``,
    so every output file owns a small rectangle of the key space and
    footer min/max pruning works for predicates on ANY of the z
    columns (single-key clustering only serves the leading key).

    Column ranges come from one min/max aggregate over the source
    (driver-side scalars, like every other model here); the z key is
    a pure integer expression, dropped before the write.
    """
    if src == dst:
        raise ValueError("compact to a new location, then swap pointers")
    df = spark.read.parquet(src)
    aggs = []
    for c in zorder_by:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_max_{c}")]
    row = df.agg(*aggs).collect()[0]
    ranges = {c: (row[f"_min_{c}"], row[f"_max_{c}"]) for c in zorder_by}
    n = max(1, math.ceil(dataset_bytes(spark, src) / target_bytes))
    if any(lo is None or hi is None for lo, hi in ranges.values()):
        # empty dataset or an all-NULL z column: no key space to
        # cluster — degrade to the plain size-fix rewrite, matching
        # compact()'s graceful handling of the same inputs
        out = df.repartition(n)
    else:
        out = (
            df.withColumn("_z", zorder_key(zorder_by, ranges))
            .repartitionByRange(n, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    out.write.mode("overwrite").parquet(dst)
    return n, spark.read.parquet(dst)
