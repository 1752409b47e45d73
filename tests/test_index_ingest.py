"""Streaming index maintenance: documents arriving over time keep the
published index current, equal to a batch rebuild at each point."""

import os

from pyspark.sql import functions as F

from hadoop_search_spark.operators.index import build_postings
from hadoop_search_spark.plans.planner import SearchEngine
from hadoop_search_spark.streaming.index_ingest import StreamingIndexer, read_docs_stream


def test_streaming_index_ingest(spark, documents, tmp_path):
    ingest_dir = str(tmp_path / "incoming")
    os.makedirs(ingest_dir)
    index_root = str(tmp_path / "index")
    checkpoint = str(tmp_path / "ckpt")

    indexer = StreamingIndexer(spark, index_root, num_partitions=4)
    stream = read_docs_stream(spark, ingest_dir)
    q = indexer.start(stream, checkpoint)
    try:
        # batch 1 arrives
        documents.filter(F.col("doc_id") < 300).select("doc_id", "text").coalesce(
            1
        ).write.mode("append").parquet(ingest_dir)
        q.processAllAvailable()
        assert indexer.current_num_docs() == 300

        eng1 = SearchEngine(spark, indexer.current_postings(), documents=documents)
        hits1 = {r.doc_id for r in eng1.search("spark and stream").collect()}
        assert hits1 and max(hits1) < 300

        # batch 2 arrives later
        documents.filter(F.col("doc_id") >= 300).select("doc_id", "text").coalesce(
            1
        ).write.mode("append").parquet(ingest_dir)
        q.processAllAvailable()
        assert indexer.current_num_docs() == 500
    finally:
        q.stop()

    # live index == full batch rebuild
    live = {
        (r.term, r.doc_id): (r.tf, r.df, round(r.score, 10))
        for r in indexer.current_postings().collect()
    }
    full = {
        (r.term, r.doc_id): (r.tf, r.df, round(r.score, 10))
        for r in build_postings(documents, num_docs=500, stem=True).collect()
    }
    assert live == full

    # queries now see the later docs
    eng2 = SearchEngine(spark, indexer.current_postings(), documents=documents)
    hits2 = {r.doc_id for r in eng2.search("spark and stream").collect()}
    assert hits1 < hits2 and any(d >= 300 for d in hits2)


def test_process_batch_replay_idempotent(spark, documents, tmp_path):
    # simulate foreachBatch replaying an epoch after a successful
    # publish (crash between pointer flip and checkpoint commit)
    indexer = StreamingIndexer(spark, str(tmp_path / "idx"), num_partitions=4)
    batch = documents.filter(F.col("doc_id") < 100).select("doc_id", "text")
    indexer.process_batch(batch, epoch_id=0)
    n1 = indexer.current_num_docs()
    rows1 = indexer.current_postings().count()

    indexer.process_batch(batch, epoch_id=0)  # replay: must be a no-op
    assert indexer.current_num_docs() == n1
    assert indexer.current_postings().count() == rows1

    # next epoch still merges normally
    indexer.process_batch(
        documents.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).select(
            "doc_id", "text"
        ),
        epoch_id=1,
    )
    assert indexer.current_num_docs() == 150


def test_vacuum_keeps_current(spark, documents, tmp_path):
    from hadoop_search_spark.streaming.index_ingest import vacuum

    indexer = StreamingIndexer(spark, str(tmp_path / "idx"), num_partitions=2)
    for e in range(4):
        indexer.process_batch(
            documents.filter(
                (F.col("doc_id") >= e * 50) & (F.col("doc_id") < (e + 1) * 50)
            ).select("doc_id", "text"),
            epoch_id=e,
        )
    removed = vacuum(str(tmp_path / "idx"), keep=2)
    assert removed == ["v0", "v1"]
    assert indexer.current_num_docs() == 200  # pointer target untouched
    assert indexer.current_postings().count() > 0


def test_publish_includes_vocab_table(spark, tmp_path):
    """Every published version carries the (term, df) vocab table, and
    it agrees with the published postings."""
    import os

    from pyspark.sql import functions as F

    from hadoop_search_spark.streaming.index_ingest import StreamingIndexer

    root = str(tmp_path / "idx")
    ix = StreamingIndexer(spark, root, stem=False)
    batch = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma")], "doc_id BIGINT, text STRING"
    )
    ix.process_batch(batch, epoch_id=0)
    cur = ix._current_path()
    vocab = {
        r.term: r.df
        for r in spark.read.parquet(os.path.join(cur, "vocab")).collect()
    }
    want = {
        r.term: r.df
        for r in ix.current_postings()
        .groupBy("term")
        .agg(F.max("df").alias("df"))
        .collect()
    }
    assert vocab == want and vocab["beta"] == 2
