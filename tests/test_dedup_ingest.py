"""Streaming near-dup ingestion: greedy-online dedup of an arriving
document stream against the accepted store, differentially tested
against an independent sequential greedy evaluator."""

import os
import random

from pyspark.sql import functions as F

from hadoop_search_spark.streaming.dedup_ingest import DOCS_SCHEMA, StreamingDeduper

THRESHOLD = 0.5


def _mk_corpus(rng, n):
    """Docs with planted near-dup families: a base text plus light
    mutations, so some pairs clear the Jaccard threshold and chains
    exist (A~B, B~C without A~C) — the case where greedy-online and
    offline clustering genuinely differ."""
    vocab = ["red", "blue", "fast", "slow", "data", "spark", "join", "scan"]
    rows = []
    base = None
    for i in range(n):
        if base is None or rng.random() < 0.4:
            base = [rng.choice(vocab) for _ in range(rng.randint(6, 12))]
            words = list(base)
        else:
            words = list(base)
            for _ in range(rng.randint(0, 2)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
    return rows


def _shingles(text, n=3):
    t = [w for w in text.lower().split(" ") if w]
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _band_keys(text):
    """Python twin of minhash_bands_wide for one doc: 16 salted
    min-hashes over md5'd shingles, 4 bands of 4, comma-joined keys —
    byte-identical to the Spark pipeline (md5 is the shared hash)."""
    import hashlib

    from hadoop_search_spark.operators.dedup import SEED_SALTS

    sh = _shingles(text)
    if not sh:
        return set()
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in sh]
    mh = [min(h ^ SEED_SALTS[i] for h in hs) for i in range(16)]
    return {
        (b, ",".join(str(mh[i]) for i in range(b * 4, b * 4 + 4)))
        for b in range(4)
    }


def _greedy_accept(rows):
    """Independent sequential evaluator of the greedy-online contract:
    accept a doc iff no ACCEPTED doc is an LSH CANDIDATE (shared band
    key — candidate generation is part of the operator contract, same
    as the batch LSH entries' oracles) verifying at >= THRESHOLD."""
    accepted = []
    for i, text in rows:
        s, bk = _shingles(text), _band_keys(text)
        dup = False
        for _, s2, bk2 in accepted:
            if bk & bk2:
                union = s | s2
                j9 = round(len(s & s2) / len(union), 9) if union else 0.0
                if j9 >= THRESHOLD:
                    dup = True
                    break
        if not dup:
            accepted.append((i, s, bk))
    return {i for i, _, _ in accepted}


def test_streaming_dedup_matches_sequential_greedy(spark, tmp_path):
    rng = random.Random(31)
    rows = _mk_corpus(rng, 60)
    want = _greedy_accept(rows)
    # sanity: the fixture actually plants duplicates AND survivors
    assert 5 < len(want) < len(rows)

    dd = StreamingDeduper(spark, str(tmp_path / "store"), threshold=THRESHOLD)
    # three arrival waves, processed via the foreachBatch body
    for epoch, lo, hi in ((0, 0, 20), (1, 20, 40), (2, 40, 60)):
        batch = spark.createDataFrame(
            [r for r in rows if lo <= r[0] < hi], DOCS_SCHEMA
        )
        dd.process_batch(batch, epoch)

    got = {r.doc_id for r in dd.current_docs().collect()}
    assert got == want


def test_streaming_dedup_replay_and_stream_api(spark, tmp_path):
    rng = random.Random(7)
    rows = _mk_corpus(rng, 30)
    want = _greedy_accept(rows)

    ingest = str(tmp_path / "incoming")
    os.makedirs(ingest)
    dd = StreamingDeduper(spark, str(tmp_path / "store"), threshold=THRESHOLD)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(ingest)
    q = dd.start(stream, str(tmp_path / "ckpt"))
    try:
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        df.filter(F.col("doc_id") < 15).coalesce(1).write.mode("append").parquet(ingest)
        q.processAllAvailable()
        n1 = dd.current_docs().count()
        assert 0 < n1 <= 15
        df.filter(F.col("doc_id") >= 15).coalesce(1).write.mode("append").parquet(ingest)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in dd.current_docs().collect()}
    assert got == want

    # replaying a published epoch is a no-op (idempotent publish)
    cur = dd._current_path()
    epoch = int(os.path.basename(cur)[1:])
    dd.process_batch(
        spark.createDataFrame(rows[:5], DOCS_SCHEMA), epoch
    )
    assert {r.doc_id for r in dd.current_docs().collect()} == got
