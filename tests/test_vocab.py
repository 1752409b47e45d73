"""Vocabulary analytics: edit-distance suggestion, co-occurrence."""

from hadoop_search_spark.operators.index import build_postings
from hadoop_search_spark.operators.vocab import related_terms, suggest_terms


def _postings(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    return build_postings(docs, num_docs=None, stem=False)


def test_suggest_terms_orders_by_dist_then_df(spark):
    p = _postings(
        spark,
        [
            (1, "table cable table"),
            (2, "table fable"),
            (3, "cable gable"),
        ],
    )
    got = [(r.term, r.df, r.dist) for r in suggest_terms(p, "table", k=3).collect()]
    # the exact word is distance 0; rhyming terms are 1 edit away
    assert got[0] == ("table", 2, 0)
    assert all(d <= 2 for _, _, d in got)
    dists = [d for _, _, d in got]
    assert dists == sorted(dists)  # closest-first ordering


def test_suggest_terms_excludes_far_terms(spark):
    p = _postings(spark, [(1, "table zebra")])
    got = {r.term for r in suggest_terms(p, "tabel").collect()}
    assert got == {"table"}


def test_related_terms_lift_and_pruning(spark):
    # 'a b' together in 3 docs, 'a' alone once, 'c' everywhere
    p = _postings(
        spark,
        [
            (1, "alpha beta common"),
            (2, "alpha beta common"),
            (3, "alpha beta common"),
            (4, "gamma common"),
        ],
    )
    out = {
        (r.t1, r.t2): (r.n_docs, r.lift)
        for r in related_terms(p, num_docs=4, min_pair_count=2).collect()
    }
    n, lift = out[("alpha", "beta")]
    assert n == 3
    assert abs(lift - (4.0 * 3 / (3 * 3))) < 1e-12  # N*c12/(c1*c2)
    # max_df pruning removes the ubiquitous term from every pair
    pruned = {
        (r.t1, r.t2)
        for r in related_terms(p, num_docs=4, max_df=3, min_pair_count=2).collect()
    }
    assert pruned == {("alpha", "beta")}


def test_engine_seeds_from_published_vocab(spark, documents):
    """build_index_tables publishes (term, df) vocabulary stats; an
    engine constructed with it has its J6 ordering cache populated
    up-front (no first-query collect) and answers identically to a
    lazily-seeded engine."""
    from hadoop_search_spark.operators.index import build_index_tables
    from hadoop_search_spark.plans.planner import SearchEngine

    tabs = build_index_tables(spark, documents, num_stop_words=2)
    seeded = SearchEngine(
        spark,
        tabs["postings"],
        documents=documents,
        vocab=tabs["vocab"],
    )
    assert seeded._vocab is not None  # populated before any query
    lazy = SearchEngine(spark, tabs["postings"], documents=documents)
    q = "(table or scan) and not stream"
    got = {(r.doc_id, r.score) for r in seeded.search(q).collect()}
    want = {(r.doc_id, r.score) for r in lazy.search(q).collect()}
    assert got == want and got
