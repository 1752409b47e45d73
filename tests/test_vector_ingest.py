"""Streaming vector-space near-dup ingestion: greedy-online dedup of
an arriving embedding stream, differentially tested against an
independent sequential evaluator that re-derives sign-projection
buckets and 9dp cosines with plain sequential Python arithmetic."""

import hashlib
import os
import random
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from hadoop_search_spark.streaming.vector_ingest import (
    VECS_SCHEMA,
    StreamingVectorDeduper,
)

THRESHOLD = 0.95
PLANES = 8
DIM = 16


def _q9(x: float) -> Decimal:
    """Spark's round(double, 9): BigDecimal of the shortest decimal
    repr, HALF_UP — Decimal(str(x)) is the Python twin (cookbook)."""
    return Decimal(str(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP)


def _sign(p: int, i: int) -> float:
    h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:10], 16)
    return float(h % 2 * 2 - 1)


def _bucket(v):
    b = 0
    for p in range(PLANES):
        s = 0.0
        for i in range(DIM):
            s += v[i] * _sign(p, i)  # left-to-right, like F.aggregate
        b = b * 2 + (1 if _q9(s) > 0 else 0)
    return b


def _cos9(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return _q9(dot / (na**0.5 * nb**0.5))


def _greedy_accept(rows):
    accepted = []
    thr = Decimal(str(THRESHOLD))
    for vid, v in rows:
        bk = _bucket(v)
        dup = False
        for _vid2, v2, bk2 in accepted:
            if bk == bk2 and _cos9(v, v2) >= thr:
                dup = True
                break
        if not dup:
            accepted.append((vid, v, bk))
    return {vid for vid, _, _ in accepted}


def _mk_vectors(rng, n):
    """Planted near-dup families: unit-ish base directions plus tiny
    perturbations (cosine ~1 within a family) and occasional fresh
    directions; chains exist, so greedy-online and offline clustering
    genuinely differ."""
    rows = []
    base = None
    for i in range(n):
        if base is None or rng.random() < 0.35:
            base = [rng.uniform(-1, 1) for _ in range(DIM)]
        v = [x + rng.uniform(-0.02, 0.02) for x in base]
        rows.append((i, v))
    return rows


def test_streaming_vector_dedup_matches_sequential_greedy(spark, tmp_path):
    rng = random.Random(11)
    rows = _mk_vectors(rng, 45)
    want = _greedy_accept(rows)
    assert 3 < len(want) < len(rows)  # fixture plants dups AND survivors

    dd = StreamingVectorDeduper(
        spark, str(tmp_path / "store"), THRESHOLD, PLANES, DIM
    )
    for epoch, lo, hi in ((0, 0, 15), (1, 15, 30), (2, 30, 45)):
        batch = spark.createDataFrame(
            [r for r in rows if lo <= r[0] < hi], VECS_SCHEMA
        )
        dd.process_batch(batch, epoch)

    got = {r.vec_id for r in dd.current_vectors().collect()}
    assert got == want

    # replaying a published epoch is a no-op (idempotent publish)
    dd.process_batch(spark.createDataFrame(rows[:5], VECS_SCHEMA), 2)
    assert {r.vec_id for r in dd.current_vectors().collect()} == want


def test_streaming_vector_dedup_stream_api(spark, tmp_path):
    rng = random.Random(5)
    rows = _mk_vectors(rng, 24)
    want = _greedy_accept(rows)

    ingest = str(tmp_path / "incoming")
    os.makedirs(ingest)
    dd = StreamingVectorDeduper(
        spark, str(tmp_path / "store"), THRESHOLD, PLANES, DIM
    )
    stream = spark.readStream.schema(VECS_SCHEMA).parquet(ingest)
    q = dd.start(stream, str(tmp_path / "ckpt"))
    try:
        df = spark.createDataFrame(rows, VECS_SCHEMA)
        df.filter(F.col("vec_id") < 12).coalesce(1).write.mode("append").parquet(
            ingest
        )
        q.processAllAvailable()
        assert 0 < dd.current_vectors().count() <= 12
        df.filter(F.col("vec_id") >= 12).coalesce(1).write.mode("append").parquet(
            ingest
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.vec_id for r in dd.current_vectors().collect()} == want
