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


def test_apply_changes_merge_semantics(spark):
    from pyspark.sql import functions as F

    from hadoop_search_spark.operators.maintenance import apply_changes

    corpus = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 3}") for i in range(30)],
        "doc_id LONG, text STRING, source STRING",
    )
    changes = spark.createDataFrame(
        [
            ("delete", 3, "x", "srcX"),          # payload of a delete is ignored
            ("delete", 999, "x", "srcX"),        # deleting a missing key is a no-op
            ("upsert", 7, "SEVEN", "src1"),      # replace
            ("upsert", 100, "new doc", "src9"),  # insert
        ],
        "op STRING, doc_id LONG, text STRING, source STRING",
    )
    got = {r.doc_id: (r.text, r.source) for r in apply_changes(corpus, changes).collect()}
    assert 3 not in got and 999 not in got
    assert got[7] == ("SEVEN", "src1")
    assert got[100] == ("new doc", "src9")
    assert got[8] == ("text 8", "src2")
    assert len(got) == 30 - 1 - 1 + 1 + 1  # -del -replaced +replacement +insert

    # unknown ops fail lazily at execution (the guard rides the
    # anti-join key), not at plan construction
    bad = changes.withColumn(
        "op", F.when(F.col("doc_id") == 3, "truncate").otherwise(F.col("op"))
    )
    merged = apply_changes(corpus, bad)  # plan builds fine
    with pytest.raises(Exception, match="unknown op"):
        merged.collect()


def test_merge_publish_rewrites_only_touched_partitions(spark, tmp_path):
    from hadoop_search_spark.operators.maintenance import apply_changes, merge_publish

    root = str(tmp_path / "corpus")
    corpus = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 4}") for i in range(80)],
        "doc_id LONG, text STRING, source STRING",
    )
    corpus.write.partitionBy("source").parquet(root)

    def files_of(part):
        d = os.path.join(root, f"source={part}")
        if not os.path.isdir(d):
            return {}
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {p: files_of(p) for p in ("src0", "src1", "src2", "src3")}
    changes = spark.createDataFrame(
        # src1: one delete + one upsert; src2: delete EVERY doc (20 of
        # them: 2, 6, ..., 78); src0/src3 untouched
        [("delete", 5, "", "src1"), ("upsert", 9, "NINE", "src1")]
        + [("delete", i, "", "src2") for i in range(2, 80, 4)],
        "op STRING, doc_id LONG, text STRING, source STRING",
    )
    touched = merge_publish(spark, root, changes, partition_col="source")
    assert touched == ["src1", "src2"]

    after = {p: files_of(p) for p in ("src0", "src1", "src2", "src3")}
    # untouched partitions: identical files, byte-for-byte untouched on disk
    assert after["src0"] == before["src0"] and after["src3"] == before["src3"]
    # fully-deleted partition: directory gone (dynamic overwrite alone
    # would have left it stale)
    assert after["src2"] == {}
    # and the on-disk result equals the logical merge over the full corpus
    want = {
        (r.doc_id, r.text, r.source)
        for r in apply_changes(corpus, changes).collect()
    }
    got = {
        (r.doc_id, r.text, r.source)
        for r in spark.read.parquet(root).collect()
    }
    assert got == want and len(got) == 80 - 1 - 20 + 1 - 1
