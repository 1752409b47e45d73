"""Hot-bucket-capped LSH candidate generation (r11 VERDICT #1).

The scale-killer class: a NEAR-identical mega-cluster (templated
boilerplate differing only in a counter/date — survives exact dedup)
shares every band key, so the within-bucket all-pairs join emits
O(m²) candidates from ONE bucket; AQE cannot split join OUTPUT.
These tests pin the capped semantics:

* below the cap, results are bit-identical to the exact join;
* an adversarial mega-cluster produces O(m) representative edges,
  not O(m²) pairs — asserted on row counts;
* the star edges preserve candidate-graph connected components;
* ``on_hot_bucket="error"`` refuses loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_search_spark.operators.dedup import (
    cross_corpus_dedup,
    minhash_bands_wide,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    simhash_pairs,
    word_shingles,
)


def _mega_corpus(spark, n: int, base_words: int = 40):
    """n near-identical, never byte-identical docs: one base text +
    a per-doc trailing counter (the templated-boilerplate shape)."""
    base = " ".join(f"w{i % 17}x{i % 7}" for i in range(base_words))
    return spark.createDataFrame(
        [(1000000 + i, f"{base} megacluster variant {i}") for i in range(n)],
        "doc_id BIGINT, text STRING",
    )


def test_capped_equals_exact_below_cap(spark, documents):
    """At the default cap no sf0.001 bucket is hot (max observed 4),
    so the capped pipeline is bit-identical to the legacy exact
    join — the existing-entries-unchanged guarantee."""
    capped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_dedup(documents).collect()
    }
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_dedup(documents, bucket_cap=None).collect()
    }
    assert capped == exact and capped


def test_mega_cluster_candidates_linear(spark):
    """600 near-identical docs: the uncapped join is quadratic
    (~m²/2 pairs); the capped join emits at most m·(cap factor)
    star/small edges. Both counts asserted so a regression in either
    direction is loud."""
    m = 600
    bands = minhash_bands_wide(word_shingles(_mega_corpus(spark, m)), 16, 4)
    n_capped = minhash_lsh_candidates(bands, bucket_cap=16).count()
    n_exact = minhash_lsh_candidates(bands, bucket_cap=None).count()
    assert n_exact > m * m / 4  # quadratic blowup is real
    assert n_capped <= 3 * m  # capped output is linear in m
    assert n_capped >= m - 1  # every member still reachable


def test_star_preserves_components(spark):
    """Capped candidate graph has the SAME connected components as
    the exact graph on a mixed corpus (mega-cluster + unrelated
    docs): every hot-bucket member stays adjacent to the
    representative."""
    mega = _mega_corpus(spark, 200)
    other = spark.createDataFrame(
        [
            (i, " ".join(f"doc{i}tok{j}q{(i * 7 + j) % 13}" for j in range(25)))
            for i in range(40)
        ],
        "doc_id BIGINT, text STRING",
    )
    docs = mega.unionByName(other)
    bands = minhash_bands_wide(word_shingles(docs), 16, 4)

    def components(pairs_df):
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs_df.collect():
            ra, rb = find(r.doc_a), find(r.doc_b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in list(parent)}

    capped = components(minhash_lsh_candidates(bands, bucket_cap=16))
    exact = components(minhash_lsh_candidates(bands, bucket_cap=None))
    assert capped == exact


def test_error_mode_raises(spark):
    bands = minhash_bands_wide(word_shingles(_mega_corpus(spark, 100)), 16, 4)
    with pytest.raises(Exception, match="LSH bucket over cap"):
        minhash_lsh_candidates(
            bands, bucket_cap=16, on_hot_bucket="error"
        ).count()
    with pytest.raises(ValueError, match="on_hot_bucket"):
        minhash_lsh_candidates(bands, bucket_cap=16, on_hot_bucket="bogus")


def test_simhash_star_hamming_exact(spark):
    """Star edges carry the TRUE Hamming distance (the
    representative's fingerprint rides along via min_by): for the
    (rep, doc) pairs present in both forms, capped hamming equals
    the exact join's hamming."""
    # 24 fingerprints agreeing on band 0 (low 10 bits), diverging in
    # 0-2 of the top bits → one hot bucket in band 0
    rows = [(i, (0b0000000101 | ((i % 4) << 20) | ((i % 3) << 35))) for i in range(24)]
    sims = spark.createDataFrame(rows, "doc_id BIGINT, simhash BIGINT")
    capped = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(sims, max_hamming=40, bucket_cap=8).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(sims, max_hamming=40, bucket_cap=None).collect()
    }
    star_pairs = {p for p in capped if p[0] == 0}
    assert star_pairs  # the hot bucket produced representative edges
    for p in star_pairs & set(exact):
        assert capped[p] == exact[p]
    # capped output is the star set (plus any small-bucket pairs),
    # strictly smaller than the exact all-pairs set
    assert len(capped) < len(exact)


def test_cross_corpus_hot_ref_bucket(spark):
    """A mega-cluster REFERENCE corpus over the cap: a new near-dup
    member is still caught (it verifies against the bucket
    representative), and the verdict schema/values hold."""
    ref = _mega_corpus(spark, 120)
    # new docs: 2 more members of the cluster + 1 unrelated
    base = ref.orderBy("doc_id").limit(1).collect()[0].text
    new = spark.createDataFrame(
        [
            (1, base.replace("variant 0", "variant A")),
            (2, base.replace("variant 0", "variant B")),
            (3, " ".join(f"fresh{j}tok{j % 5}" for j in range(30))),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r.doc_id: (r.dup_of, r.keep)
        for r in cross_corpus_dedup(new, ref, bucket_cap=16).collect()
    }
    assert got[1] == (1000000, False)  # matched via the representative
    assert got[2] == (1000000, False)
    assert got[3] == (-1, True)


def test_embedding_dedup_hot_bucket_star(spark):
    """The vector-space twin of the text cap: an embedding
    mega-cluster (near-identical vectors -> one sign bucket) emits
    O(m) representative edges with TRUE cosines; below the cap the
    capped path is bit-identical to the legacy exact join."""
    import random

    from hadoop_search_spark.operators.similarity import (
        embedding_dedup_pairs,
    )

    rng = random.Random(7)
    base = [rng.uniform(-1.0, 1.0) for _ in range(64)]
    rows = [
        (i, [x + rng.uniform(-1e-4, 1e-4) for x in base]) for i in range(300)
    ] + [
        (1000 + i, [rng.uniform(-1.0, 1.0) for _ in range(64)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    capped = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_dedup_pairs(emb, 0.95, bucket_cap=16).collect()
    }
    exact = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_dedup_pairs(
            emb, 0.95, bucket_cap=10**9
        ).collect()
    }
    # the mega-cluster shares one bucket: capped output is the star
    # set, linear in m and rooted at the bucket-min vector
    star = {p for p in capped if p[0] == 0}
    assert len(star) >= 250  # ~every cluster member via the rep
    assert len(capped) < len(exact)  # exact is quadratic in m
    # star cosines are true pair cosines — every star pair appears in
    # the exact set with the identical rounded value
    assert star <= exact
    # below-cap equivalence on the real fixture (max bucket ~8)
    fix = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    a = {(r.vec_a, r.vec_b, r.cosine)
         for r in embedding_dedup_pairs(fix, 0.35).collect()}
    b = {(r.vec_a, r.vec_b, r.cosine)
         for r in embedding_dedup_pairs(fix, 0.35, bucket_cap=10**9).collect()}
    assert a == b and a


def test_ngram_prefix_guard(spark, documents):
    """The EXACT n-gram join cannot star-cap (it would break the
    prefix lemma's no-missed-pair guarantee), so its mega-cluster
    guard is LOUD: prefix_freq_cap raises on a hot prefix shingle,
    and on a normal corpus the guarded run is value-identical to the
    unguarded one."""
    from hadoop_search_spark.operators.dedup import ngram_jaccard_pairs

    guarded = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            documents, threshold=0.5, prefix_freq_cap=10000
        ).collect()
    }
    plain = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(documents, threshold=0.5).collect()
    }
    assert guarded == plain
    with pytest.raises(Exception, match="prefix shingle blocks"):
        ngram_jaccard_pairs(
            _mega_corpus(spark, 200), threshold=0.5, prefix_freq_cap=64
        ).count()
