"""Streaming curation: the composed online pipeline (Gopher admission
→ greedy near-dup store → DSIR scoring) differentially tested — the
greedy stage against the independent sequential evaluator from the
dedup_ingest tests, the scoring stage against the batch scorer over
the same frozen model."""

import random

import pytest

from pyspark.sql import functions as F

from hadoop_search_spark.streaming.curate_ingest import (
    DOCS_SCHEMA,
    StreamingCurator,
)
from hadoop_search_spark.streaming.dsir_ingest import publish_dsir_weights
from tests.test_dedup_ingest import THRESHOLD, _greedy_accept


def _mk_corpus(rng, n):
    """Gopher-passing near-dup families: ≥50 words, ≥2 distinct Gopher
    stopwords, mean token length in [3,10]; light mutations plant
    near-dup chains. Every 7th doc is SHORT (fails the Gopher
    min-words rule) to exercise the admission filter."""
    vocab = ["red", "blue", "fast", "slow", "data", "spark", "join", "scan"]
    rows = []
    base = None
    for i in range(n):
        if i % 7 == 3:
            rows.append((i, f"src{i % 3}", "too short the and"))
            continue
        if base is None or rng.random() < 0.4:
            base = ["the", "and"] + [rng.choice(vocab) for _ in range(53)]
            words = list(base)
        else:
            words = list(base)
            for _ in range(rng.randint(0, 2)):
                words[rng.randrange(2, len(words))] = rng.choice(vocab)
        rows.append((i, f"src{i % 3}", " ".join(words)))
    return rows


@pytest.mark.slow  # 70 s streaming end-to-end lifecycle (r13 gate budget)
def test_streaming_curator_composes_filters_dedup_and_scoring(
    spark, tmp_path
):
    rng = random.Random(19)
    rows = _mk_corpus(rng, 42)
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)

    # expected admission: the same per-doc expression family (order-
    # independent, so reusing the batch exprs is fair); expected
    # dedup: the INDEPENDENT sequential greedy evaluator over the
    # admitted docs in arrival order
    from hadoop_search_spark.operators.textstats import gopher_exprs

    admitted = {
        r.doc_id: r.text
        for r in docs.filter(gopher_exprs("text")["pass"]).collect()
    }
    short_ids = {i for i, _, t in rows if len(t.split()) < 50}
    assert short_ids and short_ids.isdisjoint(admitted)
    want = _greedy_accept(sorted(admitted.items()))
    assert 3 < len(want) < len(admitted)

    model_root = str(tmp_path / "model")
    publish_dsir_weights(docs, model_root)
    cur = StreamingCurator(
        spark,
        str(tmp_path / "curated"),
        threshold=THRESHOLD,
        dsir_weights_root=model_root,
    )
    for epoch, lo, hi in ((0, 0, 14), (1, 14, 28), (2, 28, 42)):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        cur.process_batch(batch, epoch)

    got = {r.doc_id for r in cur.current_docs().collect()}
    assert got == want

    # scores exist for exactly the accepted docs and equal the batch
    # scorer over the same frozen model
    from hadoop_search_spark.operators.mixing import _dsir_toks, dsir_score

    sc = {r.doc_id: (r.n_tokens, r.score) for r in cur.scores().collect()}
    assert set(sc) == want
    weights = spark.read.parquet(f"{model_root}/v0/weights")
    default = (
        spark.read.parquet(f"{model_root}/v0/meta").collect()[0].default_w6
    )
    accepted_docs = docs.join(
        spark.createDataFrame([(int(d),) for d in want], "doc_id BIGINT"),
        "doc_id",
    )
    expect = {
        r.doc_id: (r.n_tokens, r.score)
        for r in dsir_score(
            _dsir_toks(accepted_docs, "text", "source"), weights, default
        ).collect()
    }
    assert sc == expect

    # replayed epoch: store AND scores unchanged (idempotent compose)
    cur.process_batch(docs.filter(F.col("doc_id") < 14), 2)
    assert {r.doc_id for r in cur.current_docs().collect()} == want
    assert cur.scores().count() == len(want)


def test_curator_replay_scores_epoch_lost_between_publish_and_commit(
    spark, tmp_path
):
    """The composition-level crash window: process dies AFTER the
    deduper's pointer flip but BEFORE the scorer commits its epoch.
    The replay must still score that epoch's accepted docs — the
    deduper re-reads the published version's recorded accepted ids
    instead of no-oping, and the scorer's own _SUCCESS gate (absent
    for the lost epoch) lets scoring run."""
    import shutil

    rng = random.Random(23)
    rows = _mk_corpus(rng, 28)
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    model_root = str(tmp_path / "model")
    publish_dsir_weights(docs, model_root)
    root = tmp_path / "curated"
    cur = StreamingCurator(
        spark, str(root), threshold=THRESHOLD, dsir_weights_root=model_root
    )
    b0 = docs.filter(F.col("doc_id") < 14)
    b1 = docs.filter(F.col("doc_id") >= 14)
    cur.process_batch(b0, 0)
    cur.process_batch(b1, 1)
    full = {(r.doc_id, r.score) for r in cur.scores().collect()}
    epoch1_ids = {
        r.doc_id for r in cur.scores().filter("epoch = 1").collect()
    }
    assert epoch1_ids  # the window must actually cover scored docs

    # crash simulation: scorer's epoch-1 commit is lost, the deduper's
    # store pointer (already at v1) is not
    shutil.rmtree(root / "scores" / "epoch=1")
    assert {r.doc_id for r in cur.scores().collect()} == {
        d for d, _ in full
    } - epoch1_ids

    # streaming replay re-delivers epoch 1
    cur.process_batch(b1, 1)
    assert {(r.doc_id, r.score) for r in cur.scores().collect()} == full
    # and a second replay (both sides now committed) stays a no-op
    cur.process_batch(b1, 1)
    assert {(r.doc_id, r.score) for r in cur.scores().collect()} == full
