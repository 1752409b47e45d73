"""Property-based tests (SURVEY.md §5.4) — hypothesis over the
pure-Python layers (no Spark in the loop, so hundreds of examples run
in seconds):

* the negation-wrapper algebra (tests/brute_force.py, the same
  semantics the Spark planner implements) must satisfy De Morgan laws
  and set-algebra identities against naive set evaluation;
* parser shape invariants;
* stemmer idempotence on its own output vocabulary (classic Porter is
  not idempotent in general — e.g. 'ion' cases — but must be total
  and stable-length);
* SearchResult pagination invariants.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_search_spark.functions.porter import porter_stem
from hadoop_search_spark.plans import parser as P
from hadoop_search_spark.plans.results import SearchResult

from tests import brute_force as bf

# ---- posting-list strategies ----------------------------------------

doc_ids = st.integers(min_value=0, max_value=20)


@st.composite
def posting_lists(draw):
    ids = draw(st.sets(doc_ids, max_size=10))
    return {
        d: (draw(st.floats(min_value=0.1, max_value=5.0, allow_nan=False)), None)
        for d in ids
    }


terms3 = st.fixed_dictionaries(
    {"a": posting_lists(), "b": posting_lists(), "c": posting_lists()}
)

UNIVERSE = set(range(21))


def members(query: str, terms) -> frozenset:
    return frozenset(bf.search(query, terms, UNIVERSE))


@settings(max_examples=200, deadline=None)
@given(terms3)
def test_de_morgan_and(terms):
    # not (a or b) == (not a) and (not b)
    assert members("not (a or b)", terms) == members("not a and not b", terms)


@settings(max_examples=200, deadline=None)
@given(terms3)
def test_clause_not_consumes_whole_or(terms):
    # grammar: a leading 'not' negates the WHOLE clause
    # (QueryParser.java:344-348), so 'not a or not b' ≡ ¬(a ∨ ¬b) = b∖a
    a, b = set(terms["a"]), set(terms["b"])
    assert members("not a or not b", terms) == frozenset(b - a)


@settings(max_examples=200, deadline=None)
@given(terms3)
def test_de_morgan_double_negation(terms):
    # 'not (not a or not b)' → J5's (1,1) path: ¬(¬a ∨ ¬b) = a ∩ b
    a, b = set(terms["a"]), set(terms["b"])
    assert members("not (not a or not b)", terms) == frozenset(a & b)


@settings(max_examples=200, deadline=None)
@given(terms3)
def test_and_or_against_naive_sets(terms):
    a, b, c = (set(terms[k].keys()) for k in "abc")
    assert members("a and b", terms) == frozenset(a & b)
    assert members("a or b", terms) == frozenset(a | b)
    assert members("a and not b", terms) == frozenset(a - b)
    assert members("a and b or c", terms) == frozenset(a & (b | c))
    assert members("not (a or b) and c", terms) == frozenset(c - (a | b))
    assert members("a or b and not c", terms) == frozenset((a | b) - c)


@settings(max_examples=200, deadline=None)
@given(terms3)
def test_or_scores_additive(terms):
    got = bf.search("a or b", terms, UNIVERSE)
    for d, s in got.items():
        want = terms["a"].get(d, (0.0,))[0] + terms["b"].get(d, (0.0,))[0]
        assert math.isclose(s, want, rel_tol=1e-12)


@settings(max_examples=200, deadline=None)
@given(terms3)
def test_and_scores_multiplicative(terms):
    got = bf.search("(a) and (b)", terms, UNIVERSE)
    for d, s in got.items():
        want = terms["a"][d][0] * terms["b"][d][0]
        assert math.isclose(s, want, rel_tol=1e-12)


# ---- parser invariants ----------------------------------------------

words = st.text(alphabet="abcdefgxyz", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.lists(words, min_size=1, max_size=5))
def test_parser_always_three_levels(ws):
    q = " and ".join(ws)
    tree = P.parse_query(q)
    assert isinstance(tree, P.And)
    assert len(tree.children) == len(ws)
    for clause in tree.children:
        assert isinstance(clause, P.Or)
        for op in clause.children:
            assert isinstance(op, (P.And, P.Word, P.ExceptWord, P.StopWord))


@settings(max_examples=200, deadline=None)
@given(words)
def test_parser_embedded_operators_safe(w):
    # a single word never splits, even containing 'and'/'or' substrings
    tree = P.parse_query(w)
    terms = P.query_terms(tree)
    assert terms == {porter_stem(w)}


# ---- stemmer totality/stability -------------------------------------


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=20))
def test_stemmer_total_and_bounded(w):
    s = porter_stem(w)
    assert isinstance(s, str)
    assert len(s) <= len(w)
    if len(w) <= 2:
        assert s == w  # short words never change


# ---- pagination invariants ------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), unique=True, max_size=95))
def test_pagination_partition(ids):
    pages = [ids[i : i + 10] for i in range(0, len(ids), 10)]
    sr = SearchResult(count=len(ids), pages=pages)
    # pages partition the result set, each ≤ 10
    flat = [d for p in sr.pages for d in p]
    assert flat == ids
    assert all(len(p) <= 10 for p in sr.pages)
    # serialization round-trips
    assert SearchResult.deserialize(sr.serialize()).pages == sr.pages
    # page() is clamped and total-consistent
    if sr.pages:
        assert sr.page(10**6) == sr.pages[-1]
        assert sr.page(-5) == sr.pages[0]


# ---- parser fuzz: never crashes, always yields the 3-level shape -----


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_parser_total_on_arbitrary_input(q):
    tree = P.parse_query(q)
    assert isinstance(tree, P.And)
    terms = P.query_terms(tree)
    assert all(isinstance(t, str) for t in terms)
