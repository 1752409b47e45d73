"""Vocabulary analytics over the published index — beyond-reference
search-UX operators every engine ends up needing:

* :func:`suggest_terms` — "did you mean": edit-distance term
  suggestion against the index vocabulary;
* :func:`related_terms` — document-level term co-occurrence with a
  lift score (normalized PMI numerator), the basis for "related
  searches" / query expansion.

Both read the SAME postings frame the query engine uses (term,
doc_id, tf, df, ...) — no side corpus pass.

Scale notes: the vocabulary (distinct terms + df) is tiny relative
to the corpus (Heaps' law), so suggestion is a map-only scan of a
term-keyed aggregate. Co-occurrence is a doc_id self-join whose
fan-out is quadratic in per-doc DISTINCT terms — bounded by
``max_df`` (dropping ubiquitous terms both caps the blow-up and
removes the pairs that carry no signal), the same guard a 100 TB run
would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suggest_terms(
    postings: DataFrame,
    word: str,
    max_dist: int = 2,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` index terms within ``max_dist`` edits of ``word`` →
    ``(term, df, dist)``, ordered by (dist asc, df desc, term asc) —
    closest first, popularity breaks ties, total order makes the
    top-k deterministic.

    The vocabulary aggregate is term-keyed (partial aggs apply);
    ``levenshtein`` is a JVM built-in, so the scan is map-only with
    no Python. ``TakeOrderedAndProject`` gives the bounded top-k
    without a global sort."""
    from hadoop_search_spark.operators.index import vocab_stats

    vocab = vocab_stats(postings)
    dist = F.levenshtein(F.col("term"), F.lit(word))
    return (
        vocab.withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def related_terms(
    postings: DataFrame,
    num_docs: int,
    max_df: int | None = None,
    min_pair_count: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` co-occurring term pairs →
    ``(t1, t2, n_docs, lift)`` with ``t1 < t2``,
    ``lift = N·c12 / (c1·c2)`` (>1 ⇔ positive association; the PMI
    argument), ordered by (n_docs desc, t1, t2).

    One self-join on doc_id over the (term, doc_id, df) projection;
    ``max_df`` prunes ubiquitous terms BEFORE the join (both sides),
    which is what keeps the per-doc fan-out bounded at scale. The
    per-term totals ride along from the stored df column — no second
    aggregate over the corpus."""
    base = postings.select("term", "doc_id", "df")
    if max_df is not None:
        base = base.filter(F.col("df") <= max_df)
    a = base.select(
        "doc_id", F.col("term").alias("t1"), F.col("df").alias("df1")
    )
    b = base.select(
        "doc_id", F.col("term").alias("t2"), F.col("df").alias("df2")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("df1").alias("df1"),
            F.max("df2").alias("df2"),
        )
        .filter(F.col("n_docs") >= min_pair_count)
    )
    lift = (
        F.lit(float(num_docs)) * F.col("n_docs") / (F.col("df1") * F.col("df2"))
    )
    return (
        pairs.select("t1", "t2", "n_docs", lift.alias("lift"))
        .orderBy(F.desc("n_docs"), F.asc("t1"), F.asc("t2"))
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    key: str = "doc_id",
    rank_col: str = "rn",
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankers (Cormack et al.) →
    ``(key, rank_1..rank_N, rrf, rn)``: each input is a
    ``(key, rank)`` frame (1-based, deduplicated), fused by
    ``rrf = Σ 1/(k0 + rank_i)`` with absent keys contributing 0, then
    re-ranked (rrf desc, key asc) and cut to ``k``. The standard
    hybrid-retrieval combiner: rank positions, not scores, so BM25
    and cosine (incomparable scales) fuse without calibration.

    Cross-engine exactness: each term is ONE correctly-rounded IEEE
    division and the combination is a fixed left-to-right chain of
    N−1 additions — no folds over data-dependent order — so a SQL
    oracle reproduces every rrf bit-for-bit. Absent ranks surface as
    −1 (never NULL: the driver hash treats NULL and −1 differently,
    and −1 is unambiguous since ranks are 1-based).

    Scale shape: inputs are already top-K frames (window-limited by
    their producers), so the N−1 full-outer joins touch K rows per
    ranker — request-sized, broadcastable; nothing here scales with
    the corpus."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = None
    for i, r in enumerate(rankings, start=1):
        side = r.select(
            F.col(key), F.col(rank_col).cast("bigint").alias(f"rank_{i}")
        )
        fused = side if fused is None else fused.join(side, key, "full_outer")
    rrf = None
    for i in range(1, len(rankings) + 1):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        rrf = term if rrf is None else rrf + term
    out = fused.withColumn("rrf", rrf)
    for i in range(1, len(rankings) + 1):
        out = out.withColumn(
            f"rank_{i}", F.coalesce(F.col(f"rank_{i}"), F.lit(-1).cast("bigint"))
        )
    w = Window.orderBy(F.desc("rrf"), F.asc(key))
    return out.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= k
    )
