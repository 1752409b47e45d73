"""Streaming DSIR-scored ingestion: replay-equivalence against the
batch twin, frozen-model unseen-token semantics, and mid-stream
weight refresh without a restart."""

import os

import pytest
from pyspark.sql import functions as F

from hadoop_search_spark.operators.mixing import dsir_select
from hadoop_search_spark.streaming.dsir_ingest import (
    DOCS_SCHEMA,
    StreamingDsirScorer,
    publish_dsir_weights,
)


def _rows(df):
    return {
        (r.doc_id, r.n_tokens, r.score, r.keep)
        for r in df.select("doc_id", "n_tokens", "score", "keep").collect()
    }


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_streaming_scores_equal_batch_dsir(spark, tmp_path, sf_dir):
    """Replay equivalence (the dedup_ingest discipline): publishing
    the weight model from the full corpus and streaming the SAME
    corpus through in three waves must reproduce dsir_select's batch
    output row-for-row — the decimal per-doc sum is order-independent,
    so micro-batch boundaries cannot move a score."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    publish_dsir_weights(docs, str(tmp_path / "model"))
    sc = StreamingDsirScorer(
        spark, str(tmp_path / "model"), str(tmp_path / "scores")
    )
    n = docs.count()
    cuts = (0, n // 3, 2 * n // 3, n)
    for epoch in range(3):
        batch = docs.filter(
            (F.col("doc_id") >= cuts[epoch]) & (F.col("doc_id") < cuts[epoch + 1])
        )
        sc.process_batch(batch, epoch)

    got = sc.scores()
    assert got.count() == n
    assert _rows(got) == _rows(dsir_select(docs))
    # scores carry model version + epoch lineage
    assert got.select("model_v").distinct().collect()[0][0] == 0
    assert got.select("epoch").distinct().count() == 3

    # replaying a committed epoch is a no-op (idempotent sink)
    sc.process_batch(docs.limit(5), 1)
    assert sc.scores().count() == n


def test_frozen_model_scores_unseen_tokens_as_rebuild_would(spark, tmp_path):
    """A token absent from the training vocabulary gets default_w6 —
    the SAME smoothed formula at cnt_s=cnt_t=0. Scoring a doc of one
    known + one novel token through the frozen model must equal the
    known token's table weight plus the published default."""
    train = spark.createDataFrame(
        [(0, "src0", "alpha beta"), (1, "src1", "alpha gamma")], DOCS_SCHEMA
    )
    root = str(tmp_path / "model")
    publish_dsir_weights(train, root)
    w = {
        r.tok: r.w6
        for r in spark.read.parquet(os.path.join(root, "v0/weights")).collect()
    }
    default = (
        spark.read.parquet(os.path.join(root, "v0/meta")).collect()[0].default_w6
    )
    sc = StreamingDsirScorer(spark, root, str(tmp_path / "scores"))
    sc.process_batch(
        spark.createDataFrame([(7, "srcX", "alpha zzz-novel")], DOCS_SCHEMA), 0
    )
    row = sc.scores().collect()[0]
    assert row.n_tokens == 2
    assert row.score == float(w["alpha"] + default)


def test_weights_refresh_without_stream_restart(spark, tmp_path):
    """Publishing v1 between micro-batches changes the NEXT batch's
    scores (and its model_v stamp) while the same scorer keeps
    running — the _CURRENT pointer is re-resolved per batch."""
    v0_corpus = spark.createDataFrame(
        [(0, "src0", "alpha alpha beta"), (1, "src1", "beta gamma")],
        DOCS_SCHEMA,
    )
    # v1 retrained with a different target: weights genuinely differ
    root = str(tmp_path / "model")
    publish_dsir_weights(v0_corpus, root)
    sc = StreamingDsirScorer(spark, root, str(tmp_path / "scores"))
    probe = spark.createDataFrame([(42, "srcX", "alpha beta")], DOCS_SCHEMA)
    sc.process_batch(probe, 0)
    publish_dsir_weights(v0_corpus, root, target_source="src1")
    sc.process_batch(probe.withColumn("doc_id", F.lit(43)), 1)
    rows = {r.model_v: r for r in sc.scores().collect()}
    assert set(rows) == {0, 1}
    assert rows[0].score != rows[1].score


def test_stream_api_end_to_end(spark, tmp_path):
    """Wire the scorer into a real file-source readStream and drain it
    with processAllAvailable — the foreachBatch path the docstring
    promises."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    publish_dsir_weights(docs, str(tmp_path / "model"))
    ingest = str(tmp_path / "incoming")
    os.makedirs(ingest)
    sc = StreamingDsirScorer(
        spark, str(tmp_path / "model"), str(tmp_path / "scores")
    )
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(ingest)
    q = sc.start(stream, str(tmp_path / "ckpt"))
    try:
        docs.filter(F.col("doc_id") < 100).coalesce(1).write.mode(
            "append"
        ).parquet(ingest)
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= 100).coalesce(1).write.mode(
            "append"
        ).parquet(ingest)
        q.processAllAvailable()
    finally:
        q.stop()
    assert _rows(sc.scores()) == _rows(dsir_select(docs))
