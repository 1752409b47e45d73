"""Independent brute-force evaluator of the reference's posting-list
algebra (`hadoop_wiki_search/util/QueryParser.java:96-325`), used as
the oracle for the Spark planner's end-to-end query tests.

Operates on plain dicts ``doc_id -> (score, positions|None)``.
Implements the same wrapper-type algebra (0 normal / 1 negated /
2 ignored), the same phrase-proximity boost with zero distances
skipped, and the same position-stripping rules (AND keeps leaf
positions for phrase scoring; OR operands and single-operand
copies lose them).
"""

from __future__ import annotations

import math

from hadoop_search_spark.plans import parser as P

PHRASE_FACTOR = 1.0

PL = dict[int, tuple[float, list[int] | None]]


def _strip(pl: PL) -> PL:
    return {d: (s, None) for d, (s, _p) in pl.items()}


def _intersect(a: PL, b: PL) -> PL:
    out: PL = {}
    for d in a.keys() & b.keys():
        sa, pa = a[d]
        sb, pb = b[d]
        prod = sa * sb
        if pa and pb:
            dists = [abs(x - y) for x in pa for y in pb if x != y]
            if dists:
                out[d] = (math.pow(prod, PHRASE_FACTOR + 1.0 / min(dists)), None)
                continue
        out[d] = (prod, None)
    return out


def _merge(a: PL, b: PL) -> PL:
    out: PL = {}
    for d in a.keys() | b.keys():
        s = (a[d][0] if d in a else 0.0) + (b[d][0] if d in b else 0.0)
        out[d] = (s, None)
    return out


def _difference(a: PL, b: PL) -> PL:
    return {d: (s, None) for d, (s, _p) in a.items() if d not in b}


def _and_pair(a: tuple[int, PL], b: tuple[int, PL]) -> tuple[int, PL]:
    ta, pa = a
    tb, pb = b
    if ta == 2 and tb == 2:
        return (2, {})
    if ta == 2:
        return b
    if tb == 2:
        return a
    if ta == 1 and tb == 1:
        return (1, _merge(pa, pb))
    if ta == 0 and tb == 0:
        return (0, _intersect(pa, pb))
    if ta == 1:
        return (0, _difference(pb, pa))
    return (0, _difference(pa, pb))


def _or_pair(a: tuple[int, PL], b: tuple[int, PL]) -> tuple[int, PL]:
    ta, pa = a
    tb, pb = b
    if ta == 2 and tb == 2:
        return (2, {})
    if ta == 2:
        return b
    if tb == 2:
        return a
    if ta == 1 and tb == 1:
        return (1, _intersect(pa, pb))
    if ta == 0 and tb == 0:
        return (0, _merge(pa, pb))
    if ta == 1:
        return (1, _difference(pa, pb))
    return (1, _difference(pb, pa))


def evaluate(node: P.Node, terms: dict[str, PL]) -> tuple[int, PL]:
    if isinstance(node, P.Word):
        return (0, terms.get(node.term, {}))
    if isinstance(node, P.ExceptWord):
        return (1, terms.get(node.term, {}))
    if isinstance(node, P.StopWord):
        return (2, {})
    if isinstance(node, P.And):
        children = [evaluate(c, terms) for c in node.children]
        if len(children) == 1:
            t, pl = children[0]
            return (t, _strip(pl))
        children.sort(key=lambda w: len(w[1]))
        acc = children[0]
        for nxt in children[1:]:
            acc = _and_pair(acc, nxt)
        return acc
    if isinstance(node, P.Or):
        children = [(t, _strip(pl)) for t, pl in (evaluate(c, terms) for c in node.children)]
        acc = children[0]
        for nxt in children[1:]:
            acc = _or_pair(acc, nxt)
        if node.negated:
            t, pl = acc
            return (1 - t if t != 2 else 2, pl)
        return acc
    raise TypeError(node)


def search(
    query: str,
    terms: dict[str, PL],
    universe: set[int],
    stopwords=(),
) -> dict[int, float]:
    """query → {doc_id: score}; root negation complements against the
    universe with score 0 (same deviation as the planner)."""
    tree = P.parse_query(query, [P.porter_stem(w) for w in stopwords])
    t, pl = evaluate(tree, terms)
    if t == 2:
        return {}
    if t == 1:
        return {d: 0.0 for d in universe - pl.keys()}
    return {d: s for d, (s, _p) in pl.items()}
