"""Small-file compaction: size-derived output file count, data
equality, and restored key clustering."""

import os

import pytest

from hadoop_search_spark.operators.maintenance import compact, dataset_bytes


def _parquet_files(path):
    return [
        f for f in os.listdir(path) if f.endswith(".parquet") and f.startswith("part-")
    ]


def test_compact_merges_small_files(spark, documents, tmp_path):
    src = str(tmp_path / "fragmented")
    # simulate many tiny appends
    documents.select("doc_id", "text").repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    dst = str(tmp_path / "compacted")
    n, back = compact(spark, src, dst, target_bytes=dataset_bytes(spark, src))
    assert n == 1 and len(_parquet_files(dst)) == 1
    assert back.count() == documents.count()
    assert {r.doc_id for r in back.collect()} == {
        r.doc_id for r in documents.collect()
    }


def test_compact_clusters_key_ranges(spark, documents, tmp_path):
    src = str(tmp_path / "frag2")
    documents.select("doc_id", "text").repartition(16).write.parquet(src)
    dst = str(tmp_path / "clustered")
    # quarter of the on-disk size -> ~4 output files, range-clustered
    n, back = compact(
        spark,
        src,
        dst,
        target_bytes=max(1, dataset_bytes(spark, src) // 4),
        cluster_key="doc_id",
    )
    assert n >= 2
    assert back.count() == documents.count()
    # each output file owns a contiguous, non-overlapping doc_id range
    ranges = []
    for f in _parquet_files(dst):
        ids = [
            r.doc_id
            for r in spark.read.parquet(os.path.join(dst, f)).select("doc_id").collect()
        ]
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"


def test_compact_refuses_in_place(spark, tmp_path):
    with pytest.raises(ValueError):
        compact(spark, str(tmp_path / "x"), str(tmp_path / "x"))
