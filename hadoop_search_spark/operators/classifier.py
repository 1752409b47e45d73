"""Hashed-feature linear text classifier — the fastText-style quality
filter every LLM data recipe names (GPT-3 / LLaMA "quality classifier"
stage): feature hashing over tokens, a linear model trained by batch
gradient descent IN Spark, and map-side scoring with the model
broadcast.

Reproducibility is engineered in, not hoped for:

* every cross-row sum (margins, gradients) quantizes its terms to
  DECIMAL(28,12) BEFORE aggregating — decimal addition is exact and
  order-independent, so training is bit-identical across partition
  layouts, executor counts, AND implementations (the pytest
  differential reproduces training in pure Python, exactly);
* the link function is the algebraic sigmoid x/(1+|x|) (scaled to
  [0,1]) instead of 1/(1+e^-x): it is closed under IEEE arithmetic,
  so JVM and CPython produce the same bits — libm's exp() is NOT
  ulp-identical across platforms. fastText itself ships a lookup-table
  sigmoid for the same reason: the exact link is a modeling detail,
  reproducibility is not.

Scale shape: the model is ``dim`` floats driver-side (like the k-means
centroids and the BPE merge list); each GD iteration is two shuffles
of the (cached) feature stream — one keyed by doc for margins, one
keyed by feature for gradients — with the weight table broadcast.
Scoring is map-only after the broadcast join.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_search_spark.operators.dedup import md5_int

DEFAULT_DIM = 1 << 18

_Q12 = Decimal("1e-12")


def hash_bucket(col: F.Column, dim: int) -> F.Column:
    """Feature hashing with the shared cross-engine md5 recipe:
    token → bucket in [0, dim)."""
    return F.pmod(md5_int(col, 12), F.lit(dim)).cast("bigint")


def hashed_features(
    docs: DataFrame, dim: int = DEFAULT_DIM, text_col: str = "text"
) -> DataFrame:
    """Per-doc hashed bag-of-words → ``(doc_id, f, cnt)``. Colliding
    tokens share a bucket (that IS feature hashing); counts stay
    integers so downstream arithmetic is exact."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
        ).alias("tok"),
    )
    return (
        toks.select("doc_id", hash_bucket(F.col("tok"), dim).alias("f"))
        .groupBy("doc_id", "f")
        .agg(F.count("*").alias("cnt"))
    )


def _q12(col: F.Column) -> F.Column:
    """The pre-sum quantization: a direct DOUBLE → DECIMAL(28,12)
    cast. Spark's cast goes through BigDecimal.valueOf (shortest
    decimal repr) then changePrecision(HALF_UP) — reproduced exactly
    in Python by Decimal(str(x)).quantize(1e-12, ROUND_HALF_UP). (A
    round(col, 12) BEFORE the cast would round to the nearest DOUBLE
    first — a double-rounding that can land one quantum away from the
    direct quantization.)"""
    return col.cast("decimal(28,12)")


def py_q12(x: float) -> Decimal:
    """The pure-Python twin of :func:`_q12` (used by tests and any
    driver-side bookkeeping that must match the cluster's sums)."""
    return Decimal(str(x)).quantize(_Q12, rounding=ROUND_HALF_UP)


def _sigmoid(col: F.Column) -> F.Column:
    """Algebraic sigmoid 0.5·(x/(1+|x|))+0.5 — same shape and range
    as the logistic link, but pure IEEE arithmetic (bit-identical on
    JVM and CPython; exp() is not)."""
    return F.lit(0.5) * (col / (F.lit(1.0) + F.abs(col))) + F.lit(0.5)


def py_sigmoid(x: float) -> float:
    return 0.5 * (x / (1.0 + abs(x))) + 0.5


def doc_margins(feats: DataFrame, weights: DataFrame, bias: float) -> DataFrame:
    """(doc_id, margin DOUBLE): margin = bias + Σ_f Q12(w_f · cnt).
    ``weights`` is a (f, w) frame — broadcast (model-sized); features
    missing from it contribute 0."""
    terms = feats.join(F.broadcast(weights), "f", "left").select(
        "doc_id",
        _q12(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("cnt")).alias("t"),
    )
    return terms.groupBy("doc_id").agg(
        (F.lit(float(bias)) + F.sum("t").cast("double")).alias("margin")
    )


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    dim: int = DEFAULT_DIM,
    iters: int = 5,
    lr: float = 0.5,
) -> tuple[dict[int, float], float]:
    """Batch gradient descent for the linear classifier: returns
    (weights dict f→w, bias). ``feats`` is a :func:`hashed_features`
    frame (CACHE it — every iteration scans it twice), ``labels`` is
    ``(doc_id, y)`` with y ∈ {0.0, 1.0}.

    Per iteration: margins per doc (one doc-keyed shuffle, weights
    broadcast), pointwise error err = σ(margin) − y, per-feature
    gradient Σ_docs Q12(err · cnt) (one feature-keyed shuffle), then
    the driver updates the ≤ dim-entry model — the only data that
    ever reaches the driver. All sums are quantized-decimal ⇒ the
    trained model is bit-identical under any partitioning (pinned by
    the pure-Python differential in ``tests/test_classifier.py``)."""
    spark = feats.sparkSession
    n = labels.count()
    if n == 0:
        raise ValueError("empty label set")
    w: dict[int, float] = {}
    b = 0.0
    data = feats.join(labels, "doc_id")
    for _ in range(iters):
        wdf = (
            spark.createDataFrame(list(w.items()), "f LONG, w DOUBLE")
            if w
            else spark.createDataFrame([], "f LONG, w DOUBLE")
        )
        errs = (
            doc_margins(data.select("doc_id", "f", "cnt"), wdf, b)
            .join(labels, "doc_id")
            .select("doc_id", (_sigmoid(F.col("margin")) - F.col("y")).alias("err"))
            .persist()
        )
        try:
            joined = data.join(errs, "doc_id")
            grad = (
                joined.select("f", _q12(F.col("err") * F.col("cnt")).alias("g"))
                .groupBy("f")
                .agg(F.sum("g").cast("double").alias("gf"))
                .collect()
            )
            # second action over errs reads the persisted doc-sized
            # frame, not a re-run of the margin pipeline
            gb = errs.select(_q12(F.col("err")).alias("g")).agg(
                F.sum("g").cast("double").alias("gb")
            ).collect()[0].gb
        finally:
            errs.unpersist()
        for r in grad:
            w[r.f] = w.get(r.f, 0.0) - lr * r.gf / n
        b = b - lr * float(gb) / n
    return w, b


def score_margin(
    docs: DataFrame,
    token_weights: dict[str, int],
    dim: int,
    bias: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Integer-weight scoring → ``(doc_id, n_hits, margin, pred)``:
    margin = bias + Σ_tokens w[bucket(token)] with the token→weight
    list hashed through the SAME bucket function the model uses
    (collisions merge weights additively — faithful feature hashing).
    Pure integer arithmetic end to end, so the margins are
    engine-exact (the ``text_classifier_score`` oracle); with a
    trained float model use :func:`doc_margins` instead.

    Map-only after the broadcast join: score streams past the corpus
    once, no shuffle except the per-doc aggregate."""
    spark = docs.sparkSession
    wtab = (
        spark.createDataFrame(
            [(t, int(v)) for t, v in sorted(token_weights.items())],
            "tok STRING, w LONG",
        )
        .select(hash_bucket(F.col("tok"), dim).alias("f"), "w")
        .groupBy("f")
        .agg(F.sum("w").alias("w"))
    )
    # the ONE canonical featurization path — scoring must bucket
    # exactly as training does
    feats = hashed_features(docs, dim=dim, text_col=text_col)
    return (
        feats.join(F.broadcast(wtab), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_hits"),
            (F.lit(int(bias)) + F.sum(F.col("w") * F.col("cnt")))
            .cast("bigint")
            .alias("margin"),
        )
        .select(
            "doc_id", "n_hits", "margin", (F.col("margin") > 0).alias("pred")
        )
    )
