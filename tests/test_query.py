"""End-to-end CNF query engine tests.

Golden cases ported from the reference's inline harness
(`hadoop_wiki_search/util/QueryParser.java:375-388`) plus the query
corpus of FIXTURES.md §C, cross-checked against the independent
brute-force evaluator in tests/brute_force.py.
"""

import math

import pytest

from hadoop_search_spark.operators.index import build_postings, stop_words
from hadoop_search_spark.plans.parser import (
    And,
    ExceptWord,
    Or,
    StopWord,
    Word,
    parse_query,
)
from hadoop_search_spark.plans.planner import SearchEngine

from tests import brute_force as bf


# ---------- parser ----------------------------------------------------


def test_parse_shapes():
    t = parse_query("(vanilla or not chocolate cake) and (strawberry)")
    assert isinstance(t, And) and len(t.children) == 2
    c1, c2 = t.children
    assert isinstance(c1, Or) and not c1.negated
    assert isinstance(c1.children[0], And)  # phrase wrapper
    assert c1.children[0].children == (Word("vanilla"),)
    assert isinstance(c1.children[1], ExceptWord)  # 'not chocolate cake'
    assert c2.children[0].children == (Word("strawberri"),)


def test_parse_not_clause_and_word_boundary():
    t = parse_query("not (table or scan) and normal")
    c1, c2 = t.children
    assert isinstance(c1, Or) and c1.negated
    assert len(c1.children) == 2
    # 'normal' must not split on its inner 'or'
    assert c2.children[0].children == (Word("normal"),)


def test_parse_stopword_leaf():
    t = parse_query("the and table", stopwords=["the"])
    assert t.children[0].children[0].children == (StopWord(),)


# ---------- golden harness (QueryParser.java:375-388) ------------------


HARNESS_POSTINGS = [
    # term, doc_id, score, positions — from the literal posting strings
    ("vanilla", 1, 2.0, [1, 5]),
    ("vanilla", 2, 2.0, [4, 10]),
    ("chocolate", 1, 2.0, [2, 6]),
    ("chocolate", 2, 2.0, [6, 12]),
    ("chocolate", 4, 4.0, [1, 2]),
    ("strawberri", 1, 1.4, [3, 4]),
    ("strawberri", 2, 1.4, [8, 14]),
    ("strawberri", 4, 2.0, [1, 2]),
    ("cake", 1, 1.4, [3, 4]),
    ("cake", 2, 1.4, [8, 14]),
    ("cake", 4, 2.0, [1, 2]),
]


@pytest.fixture(scope="module")
def harness_engine(spark):
    postings = spark.createDataFrame(
        [(t, d, 1, p, s) for t, d, s, p in HARNESS_POSTINGS],
        "term STRING, doc_id BIGINT, tf INT, positions ARRAY<INT>, score DOUBLE",
    )
    docs = spark.createDataFrame([(i,) for i in [1, 2, 4]], "doc_id BIGINT")
    return SearchEngine(spark, postings, documents=docs)


def test_golden_harness_query(harness_engine):
    # reference main(): "(vanilla or not chocolate cake) and (strawberry)"
    # 'not chocolate cake' is an unmatchable except-term -> empty type-1;
    # clause1 = vanilla OR ¬∅ = ¬(∅ - vanilla) = type-1 empty;
    # root AND = strawberri - ∅ = strawberri with original scores.
    rows = harness_engine.search("(vanilla or not chocolate cake) and (strawberry)").collect()
    assert [(r.doc_id, pytest.approx(r.score)) for r in rows] == [
        (4, 2.0),
        (1, 1.4),
        (2, 1.4),
    ]


def test_phrase_proximity_boost(harness_engine):
    # "vanilla cake": doc1 minDist=|5-4|=1 -> (2.0*1.4)^2 = 7.84
    #                 doc2 minDist=|10-8|=2 -> 2.8^1.5
    rows = {r.doc_id: r.score for r in harness_engine.search("vanilla cake").collect()}
    assert rows.keys() == {1, 2}
    assert rows[1] == pytest.approx(2.8**2)
    assert rows[2] == pytest.approx(2.8**1.5)


def test_and_product_no_positions_across_clauses(harness_engine):
    # "(vanilla) and (cake)": clause results are position-stripped ->
    # plain product, no proximity boost
    rows = {r.doc_id: r.score for r in harness_engine.search("(vanilla) and (cake)").collect()}
    assert rows[1] == pytest.approx(2.0 * 1.4)
    assert rows[2] == pytest.approx(2.0 * 1.4)


def test_or_adds_scores(harness_engine):
    rows = {r.doc_id: r.score for r in harness_engine.search("vanilla or cake").collect()}
    assert rows == {
        1: pytest.approx(3.4),
        2: pytest.approx(3.4),
        4: pytest.approx(2.0),
    }


def test_not_word(harness_engine):
    # "cake and not vanilla" -> cake - vanilla = {4}
    rows = harness_engine.search("cake and not vanilla").collect()
    assert [(r.doc_id, pytest.approx(r.score)) for r in rows] == [(4, 2.0)]


def test_root_negation_materializes_complement(harness_engine):
    # "not cake" -> universe - {1,2,4} = {} ; "not vanilla" -> {4}
    assert harness_engine.search("not cake").collect() == []
    rows = harness_engine.search("not vanilla").collect()
    assert [(r.doc_id, r.score) for r in rows] == [(4, 0.0)]


def test_min_distance_duplicate_interposition(spark):
    """The merged-sort min-distance must survive equal positions from
    both sides sitting *between* the optimal cross pair (the offset-2
    cases), and adjacent cross pairs in either side order."""
    cases = [
        # (pos_a, pos_b, expected nonzero min distance)
        ([5], [5, 7], 2),          # b duplicates a's position
        ([5, 7], [5], 2),          # a duplicates b's position
        ([5, 7], [5, 7], 2),       # both duplicated -> inner pair wins
        ([6], [5], 1),             # b just below a (encoded gap tests)
        ([5], [6], 1),             # a just below b
        ([1, 100], [50], 49),      # interior optimum
    ]
    postings = spark.createDataFrame(
        [
            row
            for i, (pa, pb, _) in enumerate(cases)
            for row in [
                ("alpha", i, 1, pa, 2.0),
                ("beta", i, 1, pb, 2.0),
            ]
        ],
        "term STRING, doc_id BIGINT, tf INT, positions ARRAY<INT>, score DOUBLE",
    )
    docs = spark.createDataFrame([(i,) for i in range(len(cases))], "doc_id BIGINT")
    eng = SearchEngine(spark, postings, documents=docs)
    rows = {r.doc_id: r.score for r in eng.search("alpha beta").collect()}
    for i, (_, _, dist) in enumerate(cases):
        assert rows[i] == pytest.approx(4.0 ** (1 + 1 / dist)), (i, dist)


def test_phrase_with_empty_positions_side_falls_back_to_product(spark):
    """A tf-only posting side (empty positions array — e.g. an
    externally built index without position data) must degrade to the
    plain score product, not crash the slice-based merge."""
    postings = spark.createDataFrame(
        [
            ("alpha", 1, 1, [], 2.0),
            ("beta", 1, 1, [3, 7], 2.0),
            ("gamma", 1, 1, [], 3.0),
        ],
        "term STRING, doc_id BIGINT, tf INT, positions ARRAY<INT>, score DOUBLE",
    )
    docs = spark.createDataFrame([(1,)], "doc_id BIGINT")
    eng = SearchEngine(spark, postings, documents=docs)
    rows = {r.doc_id: r.score for r in eng.search("alpha beta").collect()}
    assert rows == {1: pytest.approx(4.0)}
    rows = {r.doc_id: r.score for r in eng.search("alpha gamma").collect()}
    assert rows == {1: pytest.approx(6.0)}


def test_repeated_word_phrase_no_div_by_zero(harness_engine):
    # "vanilla vanilla": identical position arrays -> zero distances
    # skipped; min nonzero dist is |1-5|=4 (doc1), |4-10|=6 (doc2)
    rows = {r.doc_id: r.score for r in harness_engine.search("vanilla vanilla").collect()}
    assert rows[1] == pytest.approx((2.0 * 2.0) ** (1 + 1 / 4))
    assert rows[2] == pytest.approx((2.0 * 2.0) ** (1 + 1 / 6))


def test_unknown_term_empty(harness_engine):
    assert harness_engine.search("zzzqqq").collect() == []


# ---------- corpus differential vs brute force -------------------------


CORPUS_QUERIES = [
    "table",
    "table and scan",
    "table or scan",
    "table and not scan",
    "not (table or scan)",
    "table scan",
    "(spark or not batch merge) and (filter)",
    "the and table",
    "zzzqqq",
    "normal",
    "not table",
    "table and scan or merge",
    "table or not scan",
    "not table or not scan",
    "not (not table or not scan)",
    "window window",
    "fast and the",
]


@pytest.fixture(scope="module")
def corpus_setup(spark, documents):
    sw_df = stop_words(documents, k=2)
    stopword_list = [r.word for r in sw_df.collect()]
    postings = build_postings(documents, stopwords=sw_df, num_docs=500, stem=True)
    engine = SearchEngine(spark, postings, documents=documents, stopwords=stopword_list)
    terms: dict[str, bf.PL] = {}
    for r in postings.collect():
        terms.setdefault(r.term, {})[r.doc_id] = (r.score, list(r.positions))
    universe = {r.doc_id for r in documents.select("doc_id").collect()}
    return engine, terms, universe, stopword_list


@pytest.mark.parametrize("query", CORPUS_QUERIES)
def test_corpus_query_matches_brute_force(corpus_setup, query):
    engine, terms, universe, stopword_list = corpus_setup
    want = bf.search(query, terms, universe, stopwords=stopword_list)
    got = {r.doc_id: r.score for r in engine.search(query).collect()}
    assert got.keys() == want.keys(), f"membership mismatch for {query!r}"
    for d, s in want.items():
        assert math.isclose(got[d], s, rel_tol=1e-9, abs_tol=1e-12), (
            f"score mismatch for {query!r} doc {d}: {got[d]} vs {s}"
        )


def test_exact_phrase_docs(spark):
    from hadoop_search_spark.plans.planner import exact_phrase_docs

    docs = spark.createDataFrame(
        [
            (1, "big table scan now"),          # one occurrence
            (2, "table scan and table scan"),   # two occurrences
            (3, "table big scan"),              # not adjacent
            (4, "scan table"),                  # wrong order
            (5, "full table scan table scan table"),  # two occurrences
        ],
        "doc_id LONG, text STRING",
    )
    postings = build_postings(docs, num_docs=1, stem=False)
    got = {
        r.doc_id: r.n_phrase
        for r in exact_phrase_docs(postings, ["table", "scan"]).collect()
    }
    assert got == {1: 1, 2: 2, 5: 2}
    # three-word phrase, and single-word degenerates to tf
    got3 = {
        r.doc_id: r.n_phrase
        for r in exact_phrase_docs(postings, ["full", "table", "scan"]).collect()
    }
    assert got3 == {5: 1}
    got1 = {
        r.doc_id: r.n_phrase
        for r in exact_phrase_docs(postings, ["table"]).collect()
    }
    assert got1 == {1: 1, 2: 2, 3: 1, 4: 1, 5: 3}
