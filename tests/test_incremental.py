"""Incremental index maintenance: merging new documents into an
existing index must equal a full rebuild over the combined corpus."""

import pytest

from pyspark.sql import functions as F

from hadoop_search_spark.operators.index import (
    build_postings,
    merge_index,
    stop_words,
)


def _collect(postings):
    return {
        (r.term, r.doc_id): (r.tf, list(r.positions), r.df, r.score)
        for r in postings.collect()
    }


def test_merge_equals_full_rebuild(spark, documents):
    old_docs = documents.filter(F.col("doc_id") < 400)
    new_docs = documents.filter(F.col("doc_id") >= 400)
    n_old = old_docs.count()

    existing = build_postings(old_docs, num_docs=n_old, stem=True)
    merged, num_docs = merge_index(existing, n_old, new_docs, stem=True)
    assert num_docs == 500

    full = build_postings(documents, num_docs=500, stem=True)
    got, want = _collect(merged), _collect(full)
    assert got.keys() == want.keys()
    for k, (tf, pos, df, score) in want.items():
        gtf, gpos, gdf, gscore = got[k]
        assert (gtf, gpos, gdf) == (tf, pos, df)
        assert gscore == pytest.approx(score, rel=1e-12)


def test_merge_with_stopwords(spark, documents):
    sw = stop_words(documents, k=2)
    old_docs = documents.filter(F.col("doc_id") < 250)
    new_docs = documents.filter(F.col("doc_id") >= 250)
    existing = build_postings(old_docs, stopwords=sw, num_docs=250, stem=True)
    merged, _ = merge_index(existing, 250, new_docs, stopwords=sw, stem=True)
    full = build_postings(documents, stopwords=sw, num_docs=500, stem=True)
    assert _collect(merged).keys() == _collect(full).keys()


def test_merge_rescores_old_docs(spark):
    # a term that was rare becomes common: idf (and old docs' scores)
    # must drop after the merge
    old = spark.createDataFrame(
        [(1, "rare common"), (2, "common filler")], "doc_id LONG, text STRING"
    )
    new = spark.createDataFrame(
        [(3, "rare rare stuff"), (4, "rare things")], "doc_id LONG, text STRING"
    )
    existing = build_postings(old, num_docs=2, stem=False)
    before = {r.doc_id: r.score for r in existing.filter(F.col("term") == "rare").collect()}
    merged, _ = merge_index(existing, 2, new, stem=False)
    after = {r.doc_id: r.score for r in merged.filter(F.col("term") == "rare").collect()}
    assert set(after) == {1, 3, 4}
    assert after[1] < before[1]  # idf dropped for the old doc too
