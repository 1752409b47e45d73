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


def test_compact_zorder_prunes_both_dimensions(spark, tmp_path):
    import pytest

    from pyspark.sql import functions as F

    from hadoop_search_spark.operators.maintenance import compact, compact_zorder

    # two independent uniform dimensions: random-ish but deterministic
    rows = [
        (i, (i * 7919) % 10_000, (i * 104_729) % 10_000) for i in range(20_000)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "id LONG, a LONG, b LONG").repartition(
        8
    ).write.parquet(src)

    def file_spans(path, n_files_expected):
        import os

        spans = {"a": [], "b": []}
        files = [
            f for f in os.listdir(path)
            if f.startswith("part-") and f.endswith(".parquet")
        ]
        assert len(files) == n_files_expected
        for f in files:
            one = spark.read.parquet(os.path.join(path, f))
            r = one.agg(
                F.min("a"), F.max("a"), F.min("b"), F.max("b")
            ).collect()[0]
            spans["a"].append((r[1] - r[0]) / 10_000)
            spans["b"].append((r[3] - r[2]) / 10_000)
        return {k: sum(v) / len(v) for k, v in spans.items()}

    bytes_quarter = dataset_bytes(spark, src) // 16 + 1

    single = str(tmp_path / "single")
    n1, _ = compact(spark, src, single, target_bytes=bytes_quarter, cluster_key="a")
    s1 = file_spans(single, n1)

    zpath = str(tmp_path / "zorder")
    n2, back = compact_zorder(
        spark, src, zpath, zorder_by=["a", "b"], target_bytes=bytes_quarter
    )
    s2 = file_spans(zpath, n2)
    assert back.count() == 20_000

    # single-key clustering: a is tight, b spans ~everything per file
    assert s1["a"] < 0.2 and s1["b"] > 0.8
    # z-order: BOTH dimensions bounded well below the full range —
    # that is the multi-column pruning property
    assert s2["a"] < 0.6 and s2["b"] < 0.6
    assert s2["b"] < s1["b"] / 2

    with pytest.raises(ValueError):
        compact_zorder(spark, src, src, zorder_by=["a", "b"])
    with pytest.raises(ValueError):
        from hadoop_search_spark.operators.maintenance import zorder_key

        zorder_key(["a"], {"a": (0, 1)})


def test_apply_changes_random_differential(spark):
    import random

    from hadoop_search_spark.operators.maintenance import apply_changes

    rng = random.Random(83)
    corpus_rows = [(i, f"t{i}", f"s{i % 5}") for i in range(120)]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id LONG, text STRING, source STRING"
    )
    for trial in range(5):
        keys = rng.sample(range(160), rng.randint(0, 40))  # some keys absent
        change_rows = []
        for k in keys:
            if rng.random() < 0.4:
                change_rows.append(("delete", k, "", ""))
            else:
                change_rows.append(("upsert", k, f"new{trial}_{k}", "sX"))
        changes = spark.createDataFrame(
            change_rows or [("delete", -1, "", "")],
            "op STRING, doc_id LONG, text STRING, source STRING",
        )
        # dict-based reference semantics
        want = {d: (t, s) for d, t, s in corpus_rows}
        for op, k, t, s in change_rows or [("delete", -1, "", "")]:
            if op == "delete":
                want.pop(k, None)
            else:
                want[k] = (t, s)
        got = {
            r.doc_id: (r.text, r.source)
            for r in apply_changes(corpus, changes).collect()
        }
        assert got == want, f"trial {trial}"
