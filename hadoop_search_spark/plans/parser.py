"""CNF query parser — the 3-level grammar of the reference
(`hadoop_wiki_search/util/QueryParser.java:337-373`, leaf typing
`:81-94`).

Grammar (conjunctive normal form):

* query  := clause (``and`` clause)*                — split on ``\\band\\b``
* clause := [``not``] operand (``or`` operand)*     — split on ``\\bor\\b``;
  a leading ``not `` / ``not(`` / ``not (`` makes the clause NOT_OR
  (De Morgan handled at evaluation); parentheses are then erased
* operand := ``not`` word | phrase
* phrase  := word+ — words adjacent without operators form a
  *soft phrase*: an AND whose intersections get the
  proximity boost (SURVEY.md §2.4 J1)

Leaf typing (`QueryParser.java:81-94`): a stemmed word found in the
stop-word set becomes STOP_WORD (an *ignored operand*, type 2 in the
evaluation algebra); ``not w`` becomes EXCEPT_WORD (type 1).

Documented deviations from the reference:

* The reference does not stem the word of a ``not w`` operand
  (`QueryParser.java:355-356` routes it around the stemming loop), so
  ``not cakes`` can never match index term ``cake``. We stem every
  leaf word; membership semantics are otherwise identical.
* As in the reference, a ``not w`` operand is never classified as a
  stop word (the reference checks the set against the raw ``"not w"``
  string, which cannot be in it).

Word-boundary splitting matters: ``normal`` contains ``or``,
``android`` contains ``and`` — ``\\b`` anchors prevent the inner
match (reference fix #6, `QueryParser.java:17-18`).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from hadoop_search_spark.functions.porter import porter_stem

_AND_RE = re.compile(r"\band\b")
_OR_RE = re.compile(r"\bor\b")

# wrapper types of the evaluation algebra (QueryParser.java:63-70)
NORMAL = 0  # documents must appear
NEGATED = 1  # documents must NOT appear
IGNORED = 2  # stop-word operand: drop from AND/OR


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Word(Node):
    term: str


@dataclass(frozen=True)
class ExceptWord(Node):
    term: str


@dataclass(frozen=True)
class StopWord(Node):
    pass


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)
    negated: bool = False  # NOT_OR: flip wrapper type of the result


def _leaf(word: str, stopwords: frozenset[str], stem: Callable[[str], str]) -> Node:
    """Leaf typing, mirroring Query(String) (`QueryParser.java:81-94`)."""
    if word.startswith("not "):
        term = word[3:].strip()
        return ExceptWord(stem(term))
    stemmed = stem(word)
    if stemmed in stopwords:
        return StopWord()
    return Word(stemmed)


def parse_query(
    query: str,
    stopwords: Iterable[str] = (),
    stem: Callable[[str], str] = porter_stem,
) -> And:
    """Parse a CNF query string into the operator tree.

    ``stopwords`` must contain *stemmed* words — the reference's query
    side stems its stop-word list before filling STOP_WORD_SET
    (`code/query/QueryMapred.java:103-122`).
    """
    stopset = frozenset(stopwords)
    query = query.lower()  # QueryMapred.java:225 lowercases the raw query
    clauses: list[Node] = []
    for raw_clause in _AND_RE.split(query):
        clause = raw_clause.strip()
        negated = clause.startswith(("not ", "not(", "not ("))
        if negated:
            clause = clause[3:]
        clause = clause.replace("(", " ").replace(")", " ").strip()
        operands: list[Node] = []
        for raw_operand in _OR_RE.split(clause):
            operand = raw_operand.strip()
            if operand.startswith("not "):
                # 'not' operand: single word only, no phrase
                # (QueryParser.java:355-356)
                operands.append(_leaf(operand, stopset, stem))
            else:
                # phrase: AND over adjacent words (soft phrase)
                words = [w for w in operand.split(" ")]
                operands.append(
                    And(tuple(_leaf(w, stopset, stem) for w in words))
                )
        clauses.append(Or(tuple(operands), negated=negated))
    return And(tuple(clauses))


def query_terms(node: Node) -> set[str]:
    """All (stemmed) terms referenced — the map-side semi-join set of
    `code/query/QueryMapred.java:56-61` (J8)."""
    if isinstance(node, (Word, ExceptWord)):
        return {node.term}
    if isinstance(node, (And, Or)):
        out: set[str] = set()
        for c in node.children:
            out |= query_terms(c)
        return out
    return set()
