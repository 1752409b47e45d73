"""Hashed-feature linear classifier: bit-exact pure-Python training
differential, partitioning invariance, and end-to-end separation on
synthetic data."""

from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from hadoop_search_spark.operators.classifier import (
    hashed_features,
    py_q12,
    py_sigmoid,
    score_margin,
    train_logreg,
)

# md5-bucket assignments are fixed, so these synthetic docs are stable
_SPAM = ["buy cheap pills now", "cheap pills buy buy", "now now cheap deal"]
_HAM = ["the quarterly report is ready", "meeting notes are ready", "the report is here"]


def _labeled(spark, n_copies=4):
    rows = []
    i = 0
    for c in range(n_copies):
        for t in _SPAM:
            rows.append((i, f"{t} v{c}", 1.0))
            i += 1
        for t in _HAM:
            rows.append((i, f"{t} v{c}", 0.0))
            i += 1
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, y DOUBLE")


def _py_train(rows, dim, iters, lr):
    """Independent pure-Python reimplementation of train_logreg's
    exact arithmetic: quantized-decimal sums, algebraic sigmoid."""
    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % dim

    feats = {}
    labels = {}
    for doc_id, text, y in rows:
        c = {}
        for tok in [t for t in text.lower().split(" ") if t]:
            f = bucket(tok)
            c[f] = c.get(f, 0) + 1
        feats[doc_id] = c
        labels[doc_id] = y
    n = len(rows)
    w, b = {}, 0.0
    for _ in range(iters):
        errs = {}
        for d, c in feats.items():
            m = sum((py_q12(w.get(f, 0.0) * cnt) for f, cnt in c.items()),
                    Decimal(0))
            errs[d] = py_sigmoid(b + float(m)) - labels[d]
        grad = {}
        for d, c in feats.items():
            for f, cnt in c.items():
                grad[f] = grad.get(f, Decimal(0)) + py_q12(errs[d] * cnt)
        gb = sum((py_q12(e) for e in errs.values()), Decimal(0))
        for f, g in grad.items():
            w[f] = w.get(f, 0.0) - lr * float(g) / n
        b = b - lr * float(gb) / n
    return w, b


def test_train_logreg_bit_exact_vs_pure_python(spark):
    docs = _labeled(spark)
    rows = [(r.doc_id, r.text, r.y) for r in docs.collect()]
    dim, iters, lr = 128, 4, 0.5
    feats = hashed_features(docs, dim=dim).cache()
    labels = docs.select("doc_id", "y")
    w, b = train_logreg(feats, labels, dim=dim, iters=iters, lr=lr)
    pw, pb = _py_train(rows, dim, iters, lr)
    # quantized-decimal sums + algebraic sigmoid => EXACT float
    # equality, not approximate
    assert b == pb
    assert w == pw

    # partitioning invariance: the same model from a 7-way shuffle
    f2 = hashed_features(docs.repartition(7), dim=dim).cache()
    w2, b2 = train_logreg(f2, labels, dim=dim, iters=iters, lr=lr)
    assert (w2, b2) == (w, b)


@pytest.mark.slow  # quality demonstration (oracle-gated elsewhere); r13 default-gate budget
def test_trained_model_separates_and_scores(spark):
    docs = _labeled(spark, n_copies=6)
    dim = 128
    feats = hashed_features(docs, dim=dim).cache()
    w, b = train_logreg(feats, docs.select("doc_id", "y"), dim=dim, iters=8, lr=1.0)
    from hadoop_search_spark.operators.classifier import doc_margins

    wdf = spark.createDataFrame(list(w.items()), "f LONG, w DOUBLE")
    scored = doc_margins(feats, wdf, b).join(docs.select("doc_id", "y"), "doc_id")
    rows = scored.collect()
    # linearly separable synthetic set: the trained model must rank
    # every spam doc above every ham doc
    spam = [r.margin for r in rows if r.y == 1.0]
    ham = [r.margin for r in rows if r.y == 0.0]
    assert min(spam) > max(ham)


def test_score_margin_integer_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "fast fast slow"),
            (2, "slow slow dup"),
            # "words" shares bucket 34 with "slow" at dim=64 — a real
            # hash collision, scored as the weighted bucket (that IS
            # feature hashing)
            (3, "plain words only"),
            (4, "zebra apple green"),  # buckets 6/15/43: no weight, no row
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: (r.n_hits, r.margin, r.pred)
        for r in score_margin(
            docs, {"fast": 2, "slow": -2, "dup": -3}, dim=64, bias=0
        ).collect()
    }
    assert out[1] == (3, 2, True)     # 2+2-2
    assert out[2] == (3, -7, False)   # -2-2-3
    assert out[3] == (1, -2, False)   # the "words"→"slow" collision
    assert 4 not in out               # no weighted bucket → no row
    # deterministic under repartitioning
    again = {
        r.doc_id: (r.n_hits, r.margin, r.pred)
        for r in score_margin(
            docs.repartition(5), {"fast": 2, "slow": -2, "dup": -3}, dim=64
        ).collect()
    }
    assert again == out
