#!/usr/bin/env python3
"""Generate golden-parquet oracles for the non-SQL-expressible search
entries (``search_stemmed_cnf``, ``search_render_page``).

The goldens are generated INDEPENDENTLY of the Spark engine:

* pure-Python tokenizer reimplementing the reference's StringTokenizer
  semantics (P2-P5, P8) directly from the published delimiter set —
  not by calling the Spark expressions under test;
* wordcount / stop-word selection / tf-idf computed with plain Python
  dict arithmetic;
* query evaluation via the brute-force posting-list algebra in
  ``tests/brute_force.py`` (the same independent evaluator the
  differential tests use);
* only the snippet/highlight presentation helpers are the shared
  plain-Python functions from ``plans/results.py`` (themselves pinned
  by golden unit tests ported from the reference's presentation code).

Each golden row carries a ``corpus_bytes`` tag (= total utf-8 text
bytes, a corpus fingerprint — doc COUNT collides: sf0.001 and sf0.01
both have 500 docs) so ONE static oracle SQL string serves every
scale factor:

    SELECT ... FROM read_parquet('tests/golden/<q>.parquet')
    WHERE corpus_bytes = (SELECT sum(strlen(text)) FROM documents)

After generating, the script runs the real Spark catalog entries and
aborts WITHOUT writing if any row differs — a golden that disagrees
with the engine is never committed silently.

Usage: python scripts/make_goldens.py [--check-only]
"""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from hadoop_search_spark.functions.porter import porter_stem  # noqa: E402
from hadoop_search_spark.plans import parser as P  # noqa: E402
from hadoop_search_spark.plans.results import (  # noqa: E402
    highlight_words,
    make_snippet,
)
from tests import brute_force as bf  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
GOLDEN_DIR = os.path.join(ROOT, "tests", "golden")

# P2: the reference's StringTokenizer delimiter set, as a Python regex
# (independent re-expression of functions/tokenize.DELIM_REGEX).
_DELIMS = " \t\r\n,.:;'\"()[]{}/<>!?\\|-—–#$&=_*+"
_SPLIT_RE = re.compile("[" + re.escape(_DELIMS) + "]+")
_NUM_RE = re.compile(r"^[0-9]+$")
_ALNUM_RE = re.compile(r"^[a-z0-9]+$")


def _tokens(text: str) -> list[str]:
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def _load_docs(sf_dir: str) -> list[tuple[int, str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [(int(d), t) for d, t in rows]


def _stop_words(docs: list[tuple[int, str]], k: int) -> list[str]:
    """Top-k by (count desc, word desc) — the reference's bounded
    TreeSet tie order (A6). Wordcount path: drop numeric only (P4)."""
    wc: Counter[str] = Counter()
    for _, text in docs:
        for tok in _tokens(text):
            if not _NUM_RE.match(tok):
                wc[tok] += 1
    ranked = sorted(wc.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)
    return [w for w, _ in ranked[:k]]


def _build_postings(
    docs: list[tuple[int, str]],
    stopwords: set[str],
    stem: bool,
) -> bf.PL | dict:
    """term -> {doc_id: (score, positions)} with the reference formula
    ``(1 + log10(tf)) * ln(N / df)`` (mixed bases, A5). Positions are
    1-based over the raw token stream before filtering (P8)."""
    occurrences: dict[str, dict[int, list[int]]] = {}
    for doc_id, text in docs:
        for pos, tok in enumerate(_tokens(text), start=1):
            if _NUM_RE.match(tok) or not _ALNUM_RE.match(tok):
                continue
            if tok in stopwords:  # P6: unstemmed stop-word filter
                continue
            term = porter_stem(tok) if stem else tok
            occurrences.setdefault(term, {}).setdefault(doc_id, []).append(pos)
    n = float(len(docs))
    out: dict[str, dict[int, tuple[float, list[int]]]] = {}
    for term, dmap in occurrences.items():
        df = len(dmap)
        for doc_id, positions in dmap.items():
            tf = len(positions)
            score = (1.0 + math.log10(tf)) * math.log(n / df)
            out.setdefault(term, {})[doc_id] = (score, positions)
    return out


def golden_stemmed_cnf(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, score) for the catalog's stemmed-engine query."""
    stopword_list = _stop_words(docs, k=2)
    terms = _build_postings(docs, set(stopword_list), stem=True)
    universe = {d for d, _ in docs}
    result = bf.search(
        "(sparks or streaming) and not tables",
        terms,
        universe,
        stopwords=stopword_list,
    )
    return sorted((d, round(s, 9)) for d, s in result.items())


def golden_render_page(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, score, snippet) for page 1 of '(table) and (scan)' on
    the plain (un-stemmed, no-stop-word) engine."""
    query = "(table) and (scan)"
    terms = _build_postings(docs, set(), stem=False)
    tree = P.parse_query(query, stem=lambda w: w)
    t, pl = bf.evaluate(tree, terms)
    assert t == 0, "render query must be positive"
    ranked = sorted(
        ((d, s) for d, (s, _p) in pl.items()), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    words = highlight_words(query)
    text_by_id = dict(docs)
    return [
        (d, round(s, 9), make_snippet(text_by_id[d], words)) for d, s in ranked
    ]


BPE_MERGES = 16  # must match the catalog entry's n_merges


def _words(text: str) -> list[str]:
    """BPE tokenization: plain space-split, lowered (the textstats
    word contract — NOT the search tokenizer)."""
    return [w for w in text.lower().split(" ") if w]


def golden_bpe_encode(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, n_words, n_tokens, encoded): independent pure-Python
    BPE — train BPE_MERGES merges on the corpus word counts (count
    desc, pair-tuple asc ties), then apply them in rank order, each
    left-to-right with the fused symbol blocking overlap."""
    wc = Counter(w for _, t in docs for w in _words(t))
    syms = {w: list(w) for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(BPE_MERGES):
        pc: Counter[tuple[str, str]] = Counter()
        for w, c in wc.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        for w, s in syms.items():
            out: list[str] = []
            for tok in s:
                if out and out[-1] == x and tok == y:
                    out[-1] = x + y
                else:
                    out.append(tok)
            syms[w] = out
    rows = []
    for doc_id, text in docs:
        ws = _words(text)
        enc = [t for w in ws for t in syms[w]]
        rows.append((doc_id, len(ws), len(enc), " ".join(enc)))
    return sorted(rows)


BOUNDARY_MARK = "Ġ"  # Ġ — must match textstats.BOUNDARY_MARK


def golden_bpe_boundary(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, n_words, n_tokens, encoded, roundtrip_ok):
    independent pure-Python boundary-preserving BPE — the raw-case
    text splits on single spaces with empties kept, every piece after
    the first absorbs its preceding space as a Ġ prefix, BPE_MERGES
    merges train on the non-empty marked-word counts (count desc,
    pair-tuple asc ties) and apply in rank order left-to-right with
    the fused symbol blocking overlap; decode re-concatenates the
    symbol stream and translates Ġ back to a space, and roundtrip_ok
    records whether that restores the original text exactly."""

    def marked(text: str) -> list[str]:
        ps = text.split(" ")
        return [ps[0]] + [BOUNDARY_MARK + p for p in ps[1:]]

    wc = Counter(w for _, t in docs for w in marked(t) if w)
    syms = {w: list(w) for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(BPE_MERGES):
        pc: Counter[tuple[str, str]] = Counter()
        for w, c in wc.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        for w, s in syms.items():
            out: list[str] = []
            for tok in s:
                if out and out[-1] == x and tok == y:
                    out[-1] = x + y
                else:
                    out.append(tok)
            syms[w] = out
    rows = []
    for doc_id, text in docs:
        ws = marked(text)
        enc = [t for w in ws for t in syms.get(w, [])]
        decoded = "".join(enc).replace(BOUNDARY_MARK, " ")
        rows.append(
            (doc_id, len(ws), len(enc), " ".join(enc), decoded == text)
        )
    return sorted(rows)


def _load_embeddings(sf_dir: str) -> list[tuple[int, list[float]]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "ORDER BY vec_id"
    ).fetchall()
    con.close()
    return [(int(v), list(e)) for v, e in rows]


def emb_fingerprint(embs: list[tuple[int, list[float]]]) -> int:
    """Content fingerprint of the embeddings table: Σ floor(e[0]·10⁶)
    — per-row integer quantization then exact integer sum, so the SQL
    twin (floor on DOUBLE, BIGINT sum) matches bit-for-bit regardless
    of summation order. (Row COUNT collides: sf0.001 and sf0.01 both
    hold 500 vectors with different values.)"""
    return sum(math.floor(e[0] * 1_000_000) for _, e in embs)


PCA_K = 4


def _jacobi_eigh(cov):
    """Independent replay of the engine's deterministic symmetric
    eigendecomposition (operators/similarity._eigh_det): cyclic-by-
    rows Jacobi, fixed 50-sweep schedule with exact-zero off-diagonal
    early exit, scalar IEEE rotations and elementwise float64
    updates — NO LAPACK (np.linalg.eigh's runtime kernel dispatch
    produced different last-ulp eigenvectors across VM sessions,
    which is exactly the nondeterminism a golden cannot sit on).
    Same documented schedule: p = 0..d-2, q = p+1..d-1; skip iff
    A[p,q] == 0.0; theta = (A[q,q]-A[p,p])/(2 A[p,q]);
    t = sign(theta)/(|theta|+sqrt(theta²+1)) (1 when theta == 0);
    c = 1/sqrt(t²+1); s = t·c; rows then columns of A, columns of V,
    all elementwise."""
    import numpy as np

    a = np.array(cov, dtype=np.float64, copy=True)
    d = a.shape[0]
    v = np.eye(d, dtype=np.float64)
    iu = np.triu_indices(d, k=1)
    for _sweep in range(50):
        if float(np.max(np.abs(a[iu]))) == 0.0:
            break
        for p in range(d - 1):
            for q in range(p + 1, d):
                apq = float(a[p, q])
                if apq == 0.0:
                    continue
                theta = (float(a[q, q]) - float(a[p, p])) / (2.0 * apq)
                if theta == 0.0:
                    t = 1.0
                else:
                    t = math.copysign(1.0, theta) / (
                        abs(theta) + math.sqrt(theta * theta + 1.0)
                    )
                c = 1.0 / math.sqrt(t * t + 1.0)
                s = t * c
                ap = a[p, :].copy()
                aq = a[q, :].copy()
                a[p, :] = c * ap - s * aq
                a[q, :] = s * ap + c * aq
                ap = a[:, p].copy()
                aq = a[:, q].copy()
                a[:, p] = c * ap - s * aq
                a[:, q] = s * ap + c * aq
                vp = v[:, p].copy()
                vq = v[:, q].copy()
                v[:, p] = c * vp - s * vq
                v[:, q] = s * vp + c * vq
    return np.diag(a).copy(), v


def _pca_model(embs: list[tuple[int, list[float]]], k: int):
    """mean, top-k sign-pinned components, eigenvalues — the engine's
    pca_train replayed: python-int accumulation of rint-quantized
    int64 chunk sums (the overflow-proof moment contract; float64
    loses integer exactness above 2^53), then the same deterministic
    Jacobi eigendecomposition (_jacobi_eigh) + largest-|entry|-
    positive sign convention."""
    import numpy as np

    x = np.stack([e for _, e in embs]).astype(np.float64)
    n, d = x.shape
    s1l = [0] * d
    s2l = [0] * (d * d)
    for lo in range(0, n, 512):
        c = x[lo : lo + 512]
        c1 = np.rint(c * 10**9).astype(np.int64).sum(axis=0)
        c2 = (
            np.rint(c[:, :, None] * c[:, None, :] * 10**9)
            .astype(np.int64)
            .sum(axis=0)
            .ravel()
        )
        for i, v in enumerate(c1):
            s1l[i] += int(v)
        for i, v in enumerate(c2):
            s2l[i] += int(v)
    s1 = np.array([float(v) for v in s1l])
    s2 = np.array([float(v) for v in s2l]).reshape(d, d)
    mean = s1 / 10**9 / n
    cov = s2 / 10**9 / n - np.outer(mean, mean)
    vals, vecs = _jacobi_eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for i in order:
        v = vecs[:, i]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    return mean, comps, [float(vals[i]) for i in order]


def golden_pca_project(embs: list[tuple[int, list[float]]]) -> list[tuple]:
    """(vec_id, p0..p3): independent pure-Python/numpy PCA — the
    distributed moment sums re-done as per-row rint-quantized integer
    sums, the same driver-side eigh/sign convention, and the
    projection as HALF_UP-quantized decimal term sums (the exact
    arithmetic contract of operators/similarity.py:pca_project)."""
    mean, comps, _vals = _pca_model(embs, PCA_K)
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1e-9")
    out = []
    for vec_id, e in embs:
        ps = []
        for w in comps:
            total = Decimal(0)
            for xi, mi, wi in zip(e, mean, w):
                t = (float(xi) - float(mi)) * float(wi)
                total += Decimal(str(t)).quantize(q9, rounding=ROUND_HALF_UP)
            ps.append(float(total))
        out.append((vec_id, *ps))
    return sorted(out)


PQ_M, PQ_K, PQ_DIM, PQ_ITERS = 8, 16, 64, 2
PQ_QUERIES = [0, 1, 2, 3, 4]
PQ_TOPK = 10


def _sqdist_q(a: list[float], b: list[float]) -> int:
    """Integer-quantized squared L2 — Σ floor((xᵢ−cᵢ)²·1e12) as an
    exact int (CPython floats ARE IEEE doubles, so each floored term
    matches the engine's F.floor bit-for-bit and the integer sum is
    order-independent — similarity._QS)."""
    return sum(
        math.floor(((x - c) * (x - c)) * 1e12) for x, c in zip(a, b)
    )


def _train_pq_books(
    by_id: list[tuple[int, list[float]]]
) -> list[list[list[float]]]:
    """Sequential replay of pq_train_codebooks: per subspace, Lloyd's
    k-means under the _QS integer squared-L2 objective — seed = the
    first PQ_K ids' subvectors, assignment argmin of (quantized dist,
    id), means via exact DECIMAL(1e-12, HALF_UP) pre-sum + ONE float64
    division (the order-independent ivf_train_kmeans update)."""
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")
    sub = PQ_DIM // PQ_M
    books: list[list[list[float]]] = []
    for s in range(PQ_M):
        slices = [(v, [float(x) for x in e[s * sub : (s + 1) * sub]])
                  for v, e in by_id]
        cents = [list(sl) for _, sl in slices[:PQ_K]]  # seed: first k ids
        for _ in range(PQ_ITERS):
            sums = [[Decimal(0)] * sub for _ in range(PQ_K)]
            counts = [0] * PQ_K
            for _, sl in slices:
                best = min(
                    range(PQ_K), key=lambda j: (_sqdist_q(sl, cents[j]), j)
                )
                counts[best] += 1
                for d in range(sub):
                    sums[best][d] += Decimal(str(sl[d])).quantize(
                        q12, rounding=ROUND_HALF_UP
                    )
            cents = [
                [float(sums[j][d]) / counts[j] for d in range(sub)]
                if counts[j]
                else cents[j]  # emptied cell keeps its centroid
                for j in range(PQ_K)
            ]
        books.append(cents)
    return books


def _pq_adc_topk(
    by_id: list[tuple[int, list[float]]],
    books: list[list[list[float]]],
    queries: list[int] | None = None,
) -> list[tuple]:
    """Codes (ties-to-lowest _QS argmin) + per-query LUT ADC top-k —
    the shared tail of every trained-PQ golden: exact int sums
    ≤ ~2e15 < 2^53 so float() is exact, ONE IEEE division matches the
    engine's adist9 = sum/1e12 bit-for-bit, rank (adist asc, vec_id
    asc)."""
    sub = PQ_DIM // PQ_M
    codes = {}
    for v, e in by_id:
        code = 0
        for s in range(PQ_M):
            sl = [float(x) for x in e[s * sub : (s + 1) * sub]]
            best = min(
                range(PQ_K), key=lambda j: (_sqdist_q(sl, books[s][j]), j)
            )
            code += best * PQ_K**s
        codes[v] = code

    out = []
    emap = dict(by_id)
    for qid in (PQ_QUERIES if queries is None else queries):
        qe = emap[qid]
        lut = [
            [
                _sqdist_q(
                    [float(x) for x in qe[s * sub : (s + 1) * sub]],
                    books[s][j],
                )
                for j in range(PQ_K)
            ]
            for s in range(PQ_M)
        ]
        scored = []
        for v, _ in by_id:
            if v == qid:
                continue
            adist = 0
            for s in range(PQ_M):
                adist += lut[s][(codes[v] // PQ_K**s) % PQ_K]
            scored.append((float(adist) / 1e12, v))
        scored.sort()
        out += [
            (qid, v, a, rn + 1)
            for rn, (a, v) in enumerate(scored[:PQ_TOPK])
        ]
    return sorted(out)


def golden_pq_trained_topk(
    embs: list[tuple[int, list[float]]],
    queries: list[int] | None = None,
) -> list[tuple]:
    """(query_id, vec_id, adist9, rn): independent sequential replay of
    per-subspace L2 k-means training + ADC top-k — the trained twin of
    the seed-codebook SQL oracle. Every arithmetic step mirrors the
    engine's documented contract WITHOUT calling it:

    * squared L2 per subspace = Σ floor((xᵢ−cᵢ)²·1e12) as an exact int
      (CPython floats ARE IEEE doubles, so each floored term matches
      the engine's F.floor bit-for-bit and the integer sum is
      order-independent — similarity._QS, the r7 order-exact recipe
      that replaced float-sum → round(·,9));
    * assignment = argmin of (quantized dist, cell id) — ties to the
      lowest centroid, the array_sort struct ordering;
    * the k-means mean = exact sum of per-component DECIMAL(28,12)
      quantizations (the cast-to-decimal twin Decimal(str(x))
      .quantize(1e-12, HALF_UP)) divided ONCE in float64 — the
      order-independent update ivf_train_kmeans performs;
    * ADC = the same integer LUT entries summed exactly, surfaced as
      sum/1e12 in one float64 division, ranked (adist asc, vec_id
      asc).
    """
    sub = PQ_DIM // PQ_M
    by_id = sorted(embs)
    books = _train_pq_books(by_id)

    return _pq_adc_topk(by_id, books, queries)


def golden_pq_opq_topk(
    embs: list[tuple[int, list[float]]],
    queries: list[int] | None = None,
) -> list[tuple]:
    """(query_id, vec_id, adist9, rn): independent sequential replay
    of parametric OPQ (Ge et al. 2013) + trained PQ ADC:

    * the FULL 64-component PCA model from the integer-quantized
      moment replay (_pca_model — the engine's pca_train contract);
    * eigenvalue-balanced allocation: desc eigenvalues greedily into
      the subspace with free capacity and the smallest log-product,
      ties to the lowest index (the opq_allocate twin; eigh noise
      clamped at 1e-12 before the log);
    * rotation = per-coordinate HALF_UP-quantized decimal term sums
      (the pca_project/opq_rotate exact-arithmetic contract),
      coordinates ordered by the permutation;
    * then the shared trained-PQ tail (_train_pq_books +
      _pq_adc_topk) in the rotated space.
    """
    import math as _math

    from decimal import ROUND_HALF_UP, Decimal

    mean, comps, vals = _pca_model(embs, PQ_DIM)
    sub = PQ_DIM // PQ_M
    lams = [max(float(v), 1e-12) for v in vals]
    base = _math.log(min(lams))
    items = [_math.log(v) - base for v in lams]  # shift-normalized >= 0
    logs = [0.0] * PQ_M
    slots = [[] for _ in range(PQ_M)]
    for j in range(len(items)):
        best = min(
            (s for s in range(PQ_M) if len(slots[s]) < sub),
            key=lambda s: (logs[s], s),
        )
        slots[best].append(j)
        logs[best] += items[j]
    perm = [j for s in range(PQ_M) for j in slots[s]]

    q9 = Decimal("1e-9")
    rot = []
    for vec_id, e in sorted(embs):
        centered = [float(x) - float(mn) for x, mn in zip(e, mean)]
        y = []
        for comp_idx in perm:
            w = comps[comp_idx]
            total = Decimal(0)
            for xi, wi in zip(centered, w):
                total += Decimal(str(xi * float(wi))).quantize(
                    q9, rounding=ROUND_HALF_UP
                )
            y.append(float(total))
        rot.append((vec_id, y))

    books = _train_pq_books(rot)
    return _pq_adc_topk(rot, books, queries)


ANISO_DIR = os.path.join(ROOT, "tests", "fixtures", "aniso")
ANISO_QUERIES = list(range(10))


def _exact_cosine_top10(
    by_id: list[tuple[int, list[float]]], queries: list[int]
) -> dict[int, set[int]]:
    """Exact cosine top-10 SETS per query — the cosine_topk contract
    replayed: IEEE left-fold dot/norms in element order (CPython
    floats ARE IEEE doubles and F.aggregate folds in element order,
    so every partial is bit-identical), one division, round to 9dp
    via Decimal(str(x)) HALF_UP (the documented Spark round(double,9)
    twin), rank (cosine desc, vec_id asc), self excluded."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1e-9")

    def fold_norm(e):
        t = 0.0
        for x in e:
            t += float(x) * float(x)
        return math.sqrt(t)

    emap = dict(by_id)
    norms = {v: fold_norm(e) for v, e in by_id}
    out: dict[int, set[int]] = {}
    for qid in queries:
        qe = [float(x) for x in emap[qid]]
        scored = []
        for v, e in by_id:
            if v == qid:
                continue
            dot = 0.0
            for x, y in zip(e, qe):
                dot += float(x) * y
            c = dot / (norms[v] * norms[qid])
            c9 = float(Decimal(str(c)).quantize(q9, rounding=ROUND_HALF_UP))
            scored.append((-c9, v))
        scored.sort()
        out[qid] = {v for _, v in scored[:10]}
    return out


def golden_opq_aniso_win() -> list[tuple]:
    """(query_id, opq_hits, pq_hits): the OPQ WIN as driver-checkable
    DATA. Over the committed anisotropic fixture
    (tests/fixtures/aniso — decaying spectrum, rotated, clustered:
    scripts/make_aniso_fixture.py), replay exact cosine + trained PQ
    + parametric OPQ *independently* (the _exact_cosine_top10 /
    _train_pq_books / golden_pq_opq_topk chains — no engine calls)
    and count each approximate path's stage-1 top-10 hits against the
    exact top-10 per query. Σ opq_hits > Σ pq_hits is the Ge et al.
    2013 claim as values the driver hashes, not prose."""
    embs = _load_embeddings(ANISO_DIR)
    exact = _exact_cosine_top10(embs, ANISO_QUERIES)
    pqt = golden_pq_trained_topk(embs, ANISO_QUERIES)
    opq = golden_pq_opq_topk(embs, ANISO_QUERIES)

    def hits(rows) -> dict[int, int]:
        h = {q: 0 for q in ANISO_QUERIES}
        for qid, v, _a, _rn in rows:
            if v in exact[qid]:
                h[qid] += 1
        return h

    ph, oh = hits(pqt), hits(opq)
    return sorted((q, oh[q], ph[q]) for q in ANISO_QUERIES)


def golden_ivfpq_residual_trained(
    embs: list[tuple[int, list[float]]]
) -> list[tuple]:
    """(query_id, vec_id, adist9, rn): independent sequential replay
    of the FULL trained residual IVFADC pipeline (FAISS layout, the
    trained twin of the seed-book sim_ivfpq_residual_topk SQL oracle):

    * coarse centroids = the 8 smallest vec_ids (ivf_centroids
      policy); assignment by the engine's cosine ranking — integer
      _qdot sums feeding ONE IEEE division/sqrt per (vector, cell),
      ties to the lowest cell (operators/similarity._cell_ranking);
    * residual = x − centroid[cell], pointwise float64 (the
      _residual_expr twin);
    * per-subspace k-means over RESIDUAL subvectors — the exact
      _train_pq_books trainer (pq_train_codebooks over the residual
      frame);
    * codes = _QS integer argmin per residual subspace, ties to the
      lowest id;
    * ADC per (query, PROBED cell): the query's residual is taken
      against the CANDIDATE's cell; nprobe=2 cells ranked by the same
      cosine ranking; adist9 = exact-int LUT sum / 1e12, ranked
      (adist asc, vec_id asc), top 10 per query.
    """
    n_cells, nprobe = 8, 2
    sub = PQ_DIM // PQ_M
    by_id = sorted(embs)
    emap = {v: [float(x) for x in e] for v, e in by_id}

    def qdot(a, b):
        return sum(math.floor((x * y) * 1e12) for x, y in zip(a, b))

    cents = [(c, emap[by_id[c][0]]) for c in range(n_cells)]
    cqn = {c: qdot(v, v) for c, v in cents}

    def rank_cells(v):
        qv = qdot(v, v)
        scored = sorted(
            (
                -(float(qdot(v, cv)) / math.sqrt(float(qv) * float(cqn[c]))),
                c,
            )
            for c, cv in cents
        )
        return [c for _, c in scored]

    cells = {v: rank_cells(vec)[0] for v, vec in emap.items()}
    cmap = dict(cents)
    res = {
        v: [x - c for x, c in zip(vec, cmap[cells[v]])]
        for v, vec in emap.items()
    }
    books = _train_pq_books(sorted(res.items()))

    codes = {}
    for v in emap:
        code = 0
        for s in range(PQ_M):
            sl = res[v][s * sub : (s + 1) * sub]
            best = min(
                range(PQ_K), key=lambda j: (_sqdist_q(sl, books[s][j]), j)
            )
            code += best * PQ_K**s
        codes[v] = code

    out = []
    for qid in PQ_QUERIES:
        probed = rank_cells(emap[qid])[:nprobe]
        luts = {}
        for pc in probed:
            qres = [x - c for x, c in zip(emap[qid], cmap[pc])]
            luts[pc] = [
                [
                    _sqdist_q(qres[s * sub : (s + 1) * sub], books[s][j])
                    for j in range(PQ_K)
                ]
                for s in range(PQ_M)
            ]
        scored = []
        for v in emap:
            if v == qid or cells[v] not in luts:
                continue
            lut = luts[cells[v]]
            adist = 0
            for s in range(PQ_M):
                adist += lut[s][(codes[v] // PQ_K**s) % PQ_K]
            scored.append((float(adist) / 1e12, v))
        scored.sort()
        out += [
            (qid, v, a, rn + 1)
            for rn, (a, v) in enumerate(scored[:PQ_TOPK])
        ]
    return sorted(out)


def _kmeans_cells_cosine(
    by_id: list[tuple[int, list[float]]], n_cells: int, iters: int
) -> list[tuple[int, list[float]]]:
    """Sequential replay of ivf_train_kmeans(metric='cosine'): seed =
    the first ``n_cells`` vec_ids (ivf_centroids policy); per
    iteration, assign every vector by the _cell_ranking contract
    (integer _qdot sums feeding ONE IEEE division/sqrt per (vector,
    cell), ties to the lowest cell) and recompute per-cell means via
    exact DECIMAL(1e-12, HALF_UP) pre-sums + ONE float64 division
    (the order-independent update); an emptied cell keeps its
    previous centroid."""
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")
    dim = len(by_id[0][1])
    cents = [[float(x) for x in by_id[c][1]] for c in range(n_cells)]

    def qdot(a, b):
        return sum(math.floor((x * y) * 1e12) for x, y in zip(a, b))

    for _ in range(iters):
        cqn = [qdot(c, c) for c in cents]
        sums = [[Decimal(0)] * dim for _ in range(n_cells)]
        counts = [0] * n_cells
        for _v, e in by_id:
            ef = [float(x) for x in e]
            qv = qdot(ef, ef)
            best = min(
                range(n_cells),
                key=lambda c: (
                    -(
                        float(qdot(ef, cents[c]))
                        / math.sqrt(float(qv) * float(cqn[c]))
                    ),
                    c,
                ),
            )
            counts[best] += 1
            for d in range(dim):
                sums[best][d] += Decimal(str(ef[d])).quantize(
                    q12, rounding=ROUND_HALF_UP
                )
        cents = [
            [float(sums[c][d]) / counts[c] for d in range(dim)]
            if counts[c]
            else cents[c]
            for c in range(n_cells)
        ]
    return [(c, cents[c]) for c in range(n_cells)]


def _opq_perm(vals: list[float], m: int = PQ_M) -> list[int]:
    """The opq_allocate greedy replayed: desc eigenvalues into the
    subspace with free capacity and the smallest shift-normalized
    log-product, ties to the lowest index."""
    sub = len(vals) // m
    lams = [max(float(v), 1e-12) for v in vals]
    base = math.log(min(lams))
    items = [math.log(v) - base for v in lams]
    logs = [0.0] * m
    slots: list[list[int]] = [[] for _ in range(m)]
    for j in range(len(items)):
        best = min(
            (s for s in range(m) if len(slots[s]) < sub),
            key=lambda s: (logs[s], s),
        )
        slots[best].append(j)
        logs[best] += items[j]
    return [j for s in range(m) for j in slots[s]]


def _rotate_vec(vec, mean, comps, perm) -> list[float]:
    """One vector through the _opq_rotate_expr contract: center by
    mean (float64 subtraction), then per permuted component the
    HALF_UP-quantized DECIMAL(1e-9) term sum, surfaced as float64."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1e-9")
    centered = [float(x) - float(mn) for x, mn in zip(vec, mean)]
    y = []
    for comp_idx in perm:
        w = comps[comp_idx]
        total = Decimal(0)
        for xi, wi in zip(centered, w):
            total += Decimal(str(xi * float(wi))).quantize(
                q9, rounding=ROUND_HALF_UP
            )
        y.append(float(total))
    return y


def _residual_opq_chain(
    embs: list[tuple[int, list[float]]], w: int
) -> list[tuple]:
    """Shared stage-1 replay for the residual-OPQ goldens →
    (query_id, vec_id, adist9, rn) top-``w`` rows: trained coarse
    cells (_kmeans_cells_cosine, C=8, 2 iterations), residuals
    x − centroid[cell] (pointwise float64), OPQ model learned ON THE
    RESIDUAL POPULATION (the _pca_model integer-moment replay + the
    _opq_perm allocation), residual rotation via the exact decimal
    fold, per-subspace k-means in the rotated space (_train_pq_books),
    _QS integer encode, per-(query, probed-cell) ROTATED residual
    LUTs, exact-int ADC sums ranked (adist asc, vec_id asc)."""
    n_cells, nprobe = 8, 2
    sub = PQ_DIM // PQ_M
    by_id = sorted(embs)
    emap = {v: [float(x) for x in e] for v, e in by_id}

    def qdot(a, b):
        return sum(math.floor((x * y) * 1e12) for x, y in zip(a, b))

    cents = _kmeans_cells_cosine(by_id, n_cells, 2)
    cqn = {c: qdot(v, v) for c, v in cents}
    cmap = dict(cents)

    def rank_cells(v):
        qv = qdot(v, v)
        scored = sorted(
            (
                -(float(qdot(v, cv)) / math.sqrt(float(qv) * float(cqn[c]))),
                c,
            )
            for c, cv in cents
        )
        return [c for _, c in scored]

    cells = {v: rank_cells(vec)[0] for v, vec in emap.items()}
    res = {
        v: [x - c for x, c in zip(vec, cmap[cells[v]])]
        for v, vec in emap.items()
    }
    mean, comps, vals = _pca_model(sorted(res.items()), PQ_DIM)
    perm = _opq_perm(vals)
    rot = {v: _rotate_vec(r, mean, comps, perm) for v, r in res.items()}
    books = _train_pq_books(sorted(rot.items()))

    codes = {}
    for v in emap:
        code = 0
        for s in range(PQ_M):
            sl = rot[v][s * sub : (s + 1) * sub]
            best = min(
                range(PQ_K), key=lambda j: (_sqdist_q(sl, books[s][j]), j)
            )
            code += best * PQ_K**s
        codes[v] = code

    out = []
    for qid in PQ_QUERIES:
        probed = rank_cells(emap[qid])[:nprobe]
        luts = {}
        for pc in probed:
            qres = _rotate_vec(
                [x - c for x, c in zip(emap[qid], cmap[pc])],
                mean,
                comps,
                perm,
            )
            luts[pc] = [
                [
                    _sqdist_q(qres[s * sub : (s + 1) * sub], books[s][j])
                    for j in range(PQ_K)
                ]
                for s in range(PQ_M)
            ]
        scored = []
        for v in emap:
            if v == qid or cells[v] not in luts:
                continue
            lut = luts[cells[v]]
            adist = 0
            for s in range(PQ_M):
                adist += lut[s][(codes[v] // PQ_K**s) % PQ_K]
            scored.append((float(adist) / 1e12, v))
        scored.sort()
        out += [(qid, v, a, rn + 1) for rn, (a, v) in enumerate(scored[:w])]
    return sorted(out)


def golden_ivfpq_residual_opq(
    embs: list[tuple[int, list[float]]]
) -> list[tuple]:
    """(query_id, vec_id, adist9, rn): top-10 of the OPQ-rotated
    residual IVFADC chain — golden_ivfpq_residual_trained extended by
    the residual-space OPQ rotation stage (and trained coarse cells,
    where the rotation's win is measurable)."""
    return _residual_opq_chain(embs, PQ_TOPK)


def golden_cascade_residual_opq(
    embs: list[tuple[int, list[float]]]
) -> list[tuple]:
    """(query_id, vec_id, cosine, rn): the residual-OPQ cascade — the
    stage-1 top-50 from _residual_opq_chain reranked by EXACT cosine
    over the raw floats (IEEE left-fold dot/norms in element order,
    one division, Decimal(str) HALF_UP round to 9dp — the
    _topk_per_query contract), ranked (cosine desc, vec_id asc),
    top 10 per query."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1e-9")
    stage1 = _residual_opq_chain(embs, 50)
    emap = {v: [float(x) for x in e] for v, e in embs}

    def fold_norm(e):
        t = 0.0
        for x in e:
            t += x * x
        return math.sqrt(t)

    norms = {v: fold_norm(e) for v, e in emap.items()}
    cand: dict[int, list[int]] = {}
    for qid, v, _a, _rn in stage1:
        cand.setdefault(qid, []).append(v)
    out = []
    for qid in PQ_QUERIES:
        qe = emap[qid]
        scored = []
        for v in cand.get(qid, []):
            dot = 0.0
            for x, y in zip(emap[v], qe):
                dot += x * y
            c = dot / (norms[v] * norms[qid])
            c9 = float(Decimal(str(c)).quantize(q9, rounding=ROUND_HALF_UP))
            scored.append((-c9, v))
        scored.sort()
        out += [
            (qid, v, -nc, rn + 1)
            for rn, (nc, v) in enumerate(scored[:PQ_TOPK])
        ]
    return sorted(out)


STREAM_ROPQ_BUILD = 1200  # vec_id < BUILD trains the frozen models
STREAM_ROPQ_EPOCHS = 4


def golden_stream_residual_opq_replay(
    embs: list[tuple[int, list[float]]]
) -> list[tuple]:
    """(vec_id, cell, code, gen): the published codes table after the
    ONLINE residual-OPQ lifecycle — the frozen models (coarse cells
    via _kmeans_cells_cosine C=8/2 iters, residual-population
    _pca_model + _opq_perm rotation, _train_pq_books in the rotated
    residual space) are trained on the BUILD subset ONLY
    (vec_id < STREAM_ROPQ_BUILD); build rows encode at gen 0, each
    streamed epoch's rows (vec_id % STREAM_ROPQ_EPOCHS) encode under
    the SAME frozen models at gen epoch+1. A replayed epoch changes
    nothing (the engine's ledger no-op), so the golden is exactly
    assign+encode of EVERY vector with the closed-form gen map —
    which is the invariant the catalog entry asserts."""
    sub = PQ_DIM // PQ_M
    by_id = sorted(embs)
    train = [(v, e) for v, e in by_id if v < STREAM_ROPQ_BUILD]
    emap = {v: [float(x) for x in e] for v, e in by_id}

    def qdot(a, b):
        return sum(math.floor((x * y) * 1e12) for x, y in zip(a, b))

    cents = _kmeans_cells_cosine(train, 8, 2)
    cqn = {c: qdot(v, v) for c, v in cents}
    cmap = dict(cents)

    def best_cell(v):
        qv = qdot(v, v)
        return min(
            (
                (
                    -(
                        float(qdot(v, cv))
                        / math.sqrt(float(qv) * float(cqn[c]))
                    ),
                    c,
                )
                for c, cv in cents
            )
        )[1]

    cells = {v: best_cell(vec) for v, vec in emap.items()}
    res = {
        v: [x - c for x, c in zip(vec, cmap[cells[v]])]
        for v, vec in emap.items()
    }
    train_res = sorted((v, res[v]) for v, _ in train)
    mean, comps, vals = _pca_model(train_res, PQ_DIM)
    perm = _opq_perm(vals)
    rot = {v: _rotate_vec(r, mean, comps, perm) for v, r in res.items()}
    books = _train_pq_books(sorted((v, rot[v]) for v, _ in train))
    out = []
    for v in emap:
        code = 0
        for s in range(PQ_M):
            sl = rot[v][s * sub : (s + 1) * sub]
            best = min(
                range(PQ_K), key=lambda j: (_sqdist_q(sl, books[s][j]), j)
            )
            code += best * PQ_K**s
        gen = 0 if v < STREAM_ROPQ_BUILD else v % STREAM_ROPQ_EPOCHS + 1
        out.append((v, cells[v], code, gen))
    return sorted(out)


def golden_graph_authority(
    sf_dir: str, docs: list[tuple[int, str]]
) -> list[tuple]:
    """(doc_id, rank): independent PageRank over the SimHash near-dup
    graph — edges come from the ``dedup_simhash_pairs`` DuckDB oracle
    (DuckDB computes the pairs, not Spark), the iteration is pure
    Python with the engine's quantized-decimal arithmetic (terms
    DECIMAL(28,12)-quantized pre-sum), so ranks match bit-for-bit."""
    from decimal import Decimal

    from hadoop_search_spark.catalog import CATALOG
    from hadoop_search_spark.operators.classifier import py_q12 as q

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    edge_rows = con.execute(CATALOG["dedup_simhash_pairs"].oracle).fetchall()
    con.close()

    sym: dict[int, list[int]] = {}
    for a, b, _h in edge_rows:
        sym.setdefault(int(a), []).append(int(b))
        sym.setdefault(int(b), []).append(int(a))
    deg = {u: float(len(vs)) for u, vs in sym.items()}
    ids = [d for d, _ in docs]
    n = len(ids)
    d_f = 0.85
    base = (1.0 - d_f) / n
    rank = {u: 1.0 / n for u in ids}
    for _ in range(5):
        dang = sum((q(rank[u]) for u in ids if u not in deg), Decimal(0))
        dang_share = float(dang) / n
        contrib: dict[int, Decimal] = {}
        for u, vs in sym.items():
            for v in vs:
                contrib[v] = contrib.get(v, Decimal(0)) + q(rank[u] / deg[u])
        rank = {
            u: base + d_f * (float(contrib.get(u, Decimal(0))) + dang_share)
            for u in ids
        }
    return sorted(rank.items())


def golden_png_decode(docs: list[tuple[int, str]]) -> list[tuple]:
    """(media_id, width, height, checksum, decoder): FIRST-PRINCIPLES
    expectation for the real PNG decode entry — pixels are defined as
    md5(text) digest bytes tiled x12 (8x8 RGB), so the expected
    defiltered-pixel checksum is md5(digest*12). No PNG encoding or
    decoding happens here: if the codec under test mangled any filter
    or chunk, the Spark entry's checksum would diverge from this
    arithmetic."""
    import hashlib

    rows = []
    for doc_id, text in docs:
        digest = hashlib.md5(text.encode("utf-8")).digest()
        rows.append(
            (doc_id, 8, 8, hashlib.md5(digest * 12).hexdigest(), "png")
        )
    return rows


def golden_wav_decode(docs: list[tuple[int, str]]) -> list[tuple]:
    """(media_id, channels, sample_rate, n_samples, duration_ms, peak,
    checksum, decoder): first-principles expectation for the real WAV
    decode entry — samples are DEFINED as md5(text) digest bytes tiled
    x25 read as little-endian int16, so peak is the max |int16| of the
    digest's 8 sample values (tiling adds no new values) and the PCM
    checksum is md5(digest*25). struct-unpacked here, no codec, no
    numpy."""
    import hashlib
    import struct

    rows = []
    for doc_id, text in docs:
        digest = hashlib.md5(text.encode("utf-8")).digest()
        vals = struct.unpack("<8h", digest)
        peak = max(abs(v) for v in vals)
        rows.append(
            (doc_id, 1, 8000, 200, 200 * 1000 // 8000, peak,
             hashlib.md5(digest * 25).hexdigest(), "wav")
        )
    return rows


def golden_mp4_decode(docs: list[tuple[int, str]]) -> list[tuple]:
    """(media_id, n_tracks, timescale, duration_ms, width, height,
    checksum, decoder): first-principles expectation for the video
    container entry — header fields and mdat are DEFINED from
    md5(text): duration = first 4 digest bytes (big-endian) % 100000
    at timescale 1000, width/height = 16*(1 + digest[4|5] % 120),
    mdat = digest*4. No BMFF writing or walking happens here."""
    import hashlib

    rows = []
    for doc_id, text in docs:
        d = hashlib.md5(text.encode("utf-8")).digest()
        duration = int.from_bytes(d[:4], "big") % 100000
        rows.append(
            (doc_id, 1, 1000, duration * 1000 // 1000,
             16 * (1 + d[4] % 120), 16 * (1 + d[5] % 120),
             hashlib.md5(d * 4).hexdigest(), "mp4")
        )
    return rows


def _spark_aniso_rows() -> list[tuple]:
    """The live sim_opq_aniso_win entry's output (it ignores sf_dir —
    its input is the committed fixture)."""
    from hadoop_search_spark.catalog import CATALOG
    from hadoop_search_spark.session import get_spark

    spark = get_spark(app_name="make_goldens", cpus=8, shuffle_partitions=8)
    return sorted(
        (r.query_id, r.opq_hits, r.pq_hits)
        for r in CATALOG["sim_opq_aniso_win"].fn(spark, SF_DIRS[0]).collect()
    )


def _spark_residual_opq_rows() -> tuple[list[tuple], list[tuple]]:
    """The live residual-OPQ entries' output (both ignore sf_dir —
    their input is the committed aniso fixture)."""
    from hadoop_search_spark.catalog import CATALOG
    from hadoop_search_spark.session import get_spark

    spark = get_spark(app_name="make_goldens", cpus=8, shuffle_partitions=8)
    topk = sorted(
        (r.query_id, r.vec_id, r.adist9, r.rn)
        for r in CATALOG["sim_ivfpq_residual_opq"].fn(
            spark, SF_DIRS[0]
        ).collect()
    )
    casc = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rn)
        for r in CATALOG["sim_cascade_residual_opq"].fn(
            spark, SF_DIRS[0]
        ).collect()
    )
    return topk, casc


def _spark_stream_ropq_rows() -> list[tuple]:
    """The live stream_residual_opq_replay entry's output (ignores
    sf_dir — its input is the committed aniso fixture)."""
    from hadoop_search_spark.catalog import CATALOG
    from hadoop_search_spark.session import get_spark

    spark = get_spark(app_name="make_goldens", cpus=8, shuffle_partitions=8)
    return sorted(
        (r.vec_id, r.cell, r.code, r.gen)
        for r in CATALOG["stream_residual_opq_replay"].fn(
            spark, SF_DIRS[0]
        ).collect()
    )


def _spark_rows(sf_dir: str):
    """The real catalog entries' output, for the abort-on-divergence
    cross-check."""
    from hadoop_search_spark.catalog import CATALOG
    from hadoop_search_spark.session import get_spark

    spark = get_spark(app_name="make_goldens", cpus=8, shuffle_partitions=8)
    stemmed = sorted(
        (r.doc_id, r.score)
        for r in CATALOG["search_stemmed_cnf"].fn(spark, sf_dir).collect()
    )
    render = sorted(
        (r.doc_id, r.score, r.snippet)
        for r in CATALOG["search_render_page"].fn(spark, sf_dir).collect()
    )
    bpe = sorted(
        (r.doc_id, r.n_words, r.n_tokens, r.encoded)
        for r in CATALOG["text_bpe_encode"].fn(spark, sf_dir).collect()
    )
    bpeb = sorted(
        (r.doc_id, r.n_words, r.n_tokens, r.encoded, r.roundtrip_ok)
        for r in CATALOG["text_bpe_boundary"].fn(spark, sf_dir).collect()
    )
    pca = sorted(
        (r.vec_id, r.p0, r.p1, r.p2, r.p3)
        for r in CATALOG["sim_pca_project"].fn(spark, sf_dir).collect()
    )
    auth = sorted(
        (r.doc_id, r.rank)
        for r in CATALOG["graph_authority"].fn(spark, sf_dir).collect()
    )
    png = sorted(
        (r.media_id, r.width, r.height, r.checksum, r.decoder)
        for r in CATALOG["media_decode_png"].fn(spark, sf_dir).collect()
    )
    wav = sorted(
        (r.media_id, r.channels, r.sample_rate, r.n_samples,
         r.duration_ms, r.peak, r.checksum, r.decoder)
        for r in CATALOG["media_decode_wav"].fn(spark, sf_dir).collect()
    )
    mp4 = sorted(
        (r.media_id, r.n_tracks, r.timescale, r.duration_ms,
         r.width, r.height, r.checksum, r.decoder)
        for r in CATALOG["media_decode_mp4"].fn(spark, sf_dir).collect()
    )
    pqt = sorted(
        (r.query_id, r.vec_id, r.adist9, r.rn)
        for r in CATALOG["sim_pq_trained_topk"].fn(spark, sf_dir).collect()
    )
    pqrt = sorted(
        (r.query_id, r.vec_id, r.adist9, r.rn)
        for r in CATALOG["sim_ivfpq_residual_trained"].fn(
            spark, sf_dir
        ).collect()
    )
    opq = sorted(
        (r.query_id, r.vec_id, r.adist9, r.rn)
        for r in CATALOG["sim_pq_opq_topk"].fn(spark, sf_dir).collect()
    )
    return (stemmed, sorted(render), bpe, bpeb, pca, auth, png, wav, mp4,
            pqt, pqrt, opq)


def _write_golden(con, name: str, ddl_cols: str, rows: list[tuple]) -> None:
    """Write tests/golden/<name>.parquet, SKIPPING the write when the
    existing file already holds exactly these rows — regeneration
    must not churn bytes of unchanged goldens."""
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    if os.path.exists(path):
        have = sorted(map(tuple, con.execute(
            f"SELECT * FROM read_parquet('{path}')").fetchall()))
        if have == sorted(rows):
            print(f"unchanged: {path} ({len(rows)} rows)")
            return
    n_cols = ddl_cols.count(",") + 1
    ph = ", ".join("?" * n_cols)
    con.execute(f"CREATE OR REPLACE TABLE g_{name} ({ddl_cols})")
    con.executemany(f"INSERT INTO g_{name} VALUES ({ph})", rows)
    con.execute(f"COPY g_{name} TO '{path}' (FORMAT PARQUET)")
    print(f"wrote {path} ({len(rows)} rows)")


def main() -> int:
    check_only = "--check-only" in sys.argv
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    stemmed_rows: list[tuple] = []
    render_rows: list[tuple] = []
    bpe_rows: list[tuple] = []
    bpeb_rows: list[tuple] = []
    pca_rows: list[tuple] = []
    auth_rows: list[tuple] = []
    png_rows: list[tuple] = []
    wav_rows: list[tuple] = []
    mp4_rows: list[tuple] = []
    pqt_rows: list[tuple] = []
    pqrt_rows: list[tuple] = []
    opq_rows: list[tuple] = []
    ok = True
    for sf_dir in SF_DIRS:
        docs = _load_docs(sf_dir)
        embs = _load_embeddings(sf_dir)
        tag = sum(len(t.encode("utf-8")) for _, t in docs)
        efp = emb_fingerprint(embs)
        stemmed = golden_stemmed_cnf(docs)
        render = golden_render_page(docs)
        bpe = golden_bpe_encode(docs)
        bpeb = golden_bpe_boundary(docs)
        pca = golden_pca_project(embs)
        auth = golden_graph_authority(sf_dir, docs)
        png = golden_png_decode(docs)
        wav = golden_wav_decode(docs)
        mp4 = golden_mp4_decode(docs)
        pqt = golden_pq_trained_topk(embs)
        pqrt = golden_ivfpq_residual_trained(embs)
        opq = golden_pq_opq_topk(embs)
        (got_stemmed, got_render, got_bpe, got_bpeb, got_pca, got_auth,
         got_png, got_wav, got_mp4, got_pqt, got_pqrt,
         got_opq) = _spark_rows(sf_dir)
        if got_stemmed != stemmed:
            print(f"DIVERGENCE search_stemmed_cnf @ {sf_dir}")
            print("  golden:", stemmed[:3], "...")
            print("  spark :", got_stemmed[:3], "...")
            ok = False
        if got_render != sorted(render):
            print(f"DIVERGENCE search_render_page @ {sf_dir}")
            for g, s in zip(sorted(render), got_render):
                if g != s:
                    print("  golden:", g)
                    print("  spark :", s)
                    break
            ok = False
        if got_bpe != bpe:
            print(f"DIVERGENCE text_bpe_encode @ {sf_dir}")
            for g, s in zip(bpe, got_bpe):
                if g != s:
                    print("  golden:", g)
                    print("  spark :", s)
                    break
            ok = False
        if got_bpeb != bpeb:
            print(f"DIVERGENCE text_bpe_boundary @ {sf_dir}")
            for g, s in zip(bpeb, got_bpeb):
                if g != s:
                    print("  golden:", g)
                    print("  spark :", s)
                    break
            ok = False
        if not all(row[4] for row in bpeb):
            bad = [row[0] for row in bpeb if not row[4]]
            print(f"ROUNDTRIP FAILURE text_bpe_boundary @ {sf_dir}: "
                  f"docs {bad[:5]} not lossless (fixtures contain no "
                  f"marker char — this is a codec bug)")
            ok = False
        if got_pca != pca:
            print(f"DIVERGENCE sim_pca_project @ {sf_dir}")
            for g, s in zip(pca, got_pca):
                if g != s:
                    print("  golden:", g)
                    print("  spark :", s)
                    break
            ok = False
        if got_auth != auth:
            print(f"DIVERGENCE graph_authority @ {sf_dir}")
            for g, s in zip(auth, got_auth):
                if g != s:
                    print("  golden:", g)
                    print("  spark :", s)
                    break
            ok = False
        if got_png != png:
            print(f"DIVERGENCE media_decode_png @ {sf_dir}")
            for g, s_ in zip(png, got_png):
                if g != s_:
                    print("  golden:", g)
                    print("  spark :", s_)
                    break
            ok = False
        if got_wav != wav:
            print(f"DIVERGENCE media_decode_wav @ {sf_dir}")
            for g, s_ in zip(wav, got_wav):
                if g != s_:
                    print("  golden:", g)
                    print("  spark :", s_)
                    break
            ok = False
        if got_mp4 != mp4:
            print(f"DIVERGENCE media_decode_mp4 @ {sf_dir}")
            for g, s_ in zip(mp4, got_mp4):
                if g != s_:
                    print("  golden:", g)
                    print("  spark :", s_)
                    break
            ok = False
        if got_pqt != pqt:
            print(f"DIVERGENCE sim_pq_trained_topk @ {sf_dir}")
            for g, s_ in zip(pqt, got_pqt):
                if g != s_:
                    print("  golden:", g)
                    print("  spark :", s_)
                    break
            ok = False
        if got_pqrt != pqrt:
            print(f"DIVERGENCE sim_ivfpq_residual_trained @ {sf_dir}")
            for g, s_ in zip(pqrt, got_pqrt):
                if g != s_:
                    print("  golden:", g)
                    print("  spark :", s_)
                    break
            ok = False
        if got_opq != opq:
            print(f"DIVERGENCE sim_pq_opq_topk @ {sf_dir}")
            for g, s_ in zip(opq, got_opq):
                if g != s_:
                    print("  golden:", g)
                    print("  spark :", s_)
                    break
            ok = False
        stemmed_rows += [(d, s, tag) for d, s in stemmed]
        render_rows += [(d, s, sn, tag) for d, s, sn in render]
        bpe_rows += [(d, nw, nt, e, tag) for d, nw, nt, e in bpe]
        bpeb_rows += [(d, nw, nt, e, rt, tag) for d, nw, nt, e, rt in bpeb]
        pca_rows += [(v, *ps, efp) for v, *ps in pca]
        auth_rows += [(d, r, tag) for d, r in auth]
        png_rows += [(*row, tag) for row in png]
        wav_rows += [(*row, tag) for row in wav]
        mp4_rows += [(*row, tag) for row in mp4]
        pqt_rows += [(*row, efp) for row in pqt]
        pqrt_rows += [(*row, efp) for row in pqrt]
        opq_rows += [(*row, efp) for row in opq]
        print(f"{sf_dir}: stemmed={len(stemmed)} rows, "
              f"render={len(render)} rows, bpe={len(bpe)} rows, "
              f"pca={len(pca)} rows (emb_fp={efp})")
    # the aniso OPQ-win golden is SF-independent (its input is the
    # committed fixture, not a driver table) — generated once, same
    # abort-on-divergence cross-check against the live entry
    aniso = golden_opq_aniso_win()
    afp = emb_fingerprint(_load_embeddings(ANISO_DIR))
    got_aniso = _spark_aniso_rows()
    if got_aniso != aniso:
        print("DIVERGENCE sim_opq_aniso_win @ tests/fixtures/aniso")
        print("  golden:", aniso)
        print("  spark :", got_aniso)
        ok = False
    aniso_rows = [(q, o, p, afp) for q, o, p in aniso]
    if sum(o for _, o, _p in aniso) <= sum(p for _, _o, p in aniso):
        print("OPQ WIN MISSING on the aniso fixture: "
              f"{aniso} — fixture or allocation regressed")
        ok = False
    print(f"aniso: opq_hits={sum(o for _, o, _p in aniso)} "
          f"pq_hits={sum(p for _, _o, p in aniso)} (emb_fp={afp})")

    # residual-OPQ goldens — also aniso-fixture-based (the rotation's
    # win needs anisotropy), same cross-check + a recall floor so a
    # regression that silently degrades the chain (not just diverges
    # from the engine) also aborts generation
    aembs = _load_embeddings(ANISO_DIR)
    ropq = golden_ivfpq_residual_opq(aembs)
    ropqc = golden_cascade_residual_opq(aembs)
    got_ropq, got_ropqc = _spark_residual_opq_rows()
    if got_ropq != ropq:
        print("DIVERGENCE sim_ivfpq_residual_opq @ tests/fixtures/aniso")
        for g, s_ in zip(ropq, got_ropq):
            if g != s_:
                print("  golden:", g)
                print("  spark :", s_)
                break
        ok = False
    if got_ropqc != ropqc:
        print("DIVERGENCE sim_cascade_residual_opq @ tests/fixtures/aniso")
        for g, s_ in zip(ropqc, got_ropqc):
            if g != s_:
                print("  golden:", g)
                print("  spark :", s_)
                break
        ok = False
    exact10 = _exact_cosine_top10(aembs, PQ_QUERIES)
    s1_hits = sum(1 for q, v, _a, _rn in ropq if v in exact10[q])
    casc_hits = sum(1 for q, v, _c, _rn in ropqc if v in exact10[q])
    # measured: stage-1 0.49 (24-25/50), cascade 0.96 (48/50)
    if s1_hits < 22 or casc_hits < 45:
        print(f"RESIDUAL-OPQ QUALITY REGRESSED: stage1 {s1_hits}/50, "
              f"cascade {casc_hits}/50 — rotation or chain broken")
        ok = False
    print(f"residual-opq: stage1_hits={s1_hits}/50 "
          f"cascade_hits={casc_hits}/50 (emb_fp={afp})")
    ropq_rows = [(*row, afp) for row in ropq]
    ropqc_rows = [(*row, afp) for row in ropqc]

    # streaming replay over the rotated-code encoding (r11): the
    # frozen models train on the BUILD subset only, so this golden is
    # NOT derivable from the sim_ivfpq_residual_opq chain — full
    # independent replay + the same abort-on-divergence cross-check,
    # plus structural invariants (population + gen lineage) so a
    # regression that keeps values self-consistent but breaks the
    # lifecycle also aborts
    sropq = golden_stream_residual_opq_replay(aembs)
    got_sropq = _spark_stream_ropq_rows()
    if got_sropq != sropq:
        print("DIVERGENCE stream_residual_opq_replay @ "
              "tests/fixtures/aniso")
        for g, s_ in zip(sropq, got_sropq):
            if g != s_:
                print("  golden:", g)
                print("  spark :", s_)
                break
        ok = False
    gens = Counter(g for _v, _c, _code, g in sropq)
    if len(sropq) != len(aembs) or gens[0] != STREAM_ROPQ_BUILD or any(
        gens[e + 1] != (len(aembs) - STREAM_ROPQ_BUILD) // STREAM_ROPQ_EPOCHS
        for e in range(STREAM_ROPQ_EPOCHS)
    ):
        print(f"STREAM-ROPQ LIFECYCLE BROKEN: {len(sropq)} rows, "
              f"gens={dict(gens)}")
        ok = False
    print(f"stream-ropq: {len(sropq)} rows, gens={dict(sorted(gens.items()))} "
          f"(emb_fp={afp})")
    sropq_rows = [(*row, afp) for row in sropq]

    if not ok:
        print("ABORTING — goldens not written")
        return 1
    if check_only:
        print("check-only: engine matches independent generation")
        return 0
    con = duckdb.connect()
    _write_golden(
        con, "search_stemmed_cnf",
        "doc_id BIGINT, score DOUBLE, corpus_bytes BIGINT", stemmed_rows,
    )
    _write_golden(
        con, "search_render_page",
        "doc_id BIGINT, score DOUBLE, snippet VARCHAR, corpus_bytes BIGINT",
        render_rows,
    )
    _write_golden(
        con, "text_bpe_encode",
        "doc_id BIGINT, n_words BIGINT, n_tokens BIGINT, encoded VARCHAR, "
        "corpus_bytes BIGINT",
        bpe_rows,
    )
    _write_golden(
        con, "text_bpe_boundary",
        "doc_id BIGINT, n_words BIGINT, n_tokens BIGINT, encoded VARCHAR, "
        "roundtrip_ok BOOLEAN, corpus_bytes BIGINT",
        bpeb_rows,
    )
    _write_golden(
        con, "graph_authority",
        "doc_id BIGINT, rank DOUBLE, corpus_bytes BIGINT",
        auth_rows,
    )
    _write_golden(
        con, "media_decode_png",
        "media_id BIGINT, width INT, height INT, checksum VARCHAR, "
        "decoder VARCHAR, corpus_bytes BIGINT",
        png_rows,
    )
    _write_golden(
        con, "media_decode_wav",
        "media_id BIGINT, channels INT, sample_rate INT, n_samples BIGINT, "
        "duration_ms BIGINT, peak INT, checksum VARCHAR, decoder VARCHAR, "
        "corpus_bytes BIGINT",
        wav_rows,
    )
    _write_golden(
        con, "media_decode_mp4",
        "media_id BIGINT, n_tracks INT, timescale INT, duration_ms BIGINT, "
        "width INT, height INT, checksum VARCHAR, decoder VARCHAR, "
        "corpus_bytes BIGINT",
        mp4_rows,
    )
    _write_golden(
        con, "sim_pca_project",
        "vec_id BIGINT, p0 DOUBLE, p1 DOUBLE, p2 DOUBLE, p3 DOUBLE, "
        "emb_fp BIGINT",
        pca_rows,
    )
    _write_golden(
        con, "sim_pq_trained_topk",
        "query_id BIGINT, vec_id BIGINT, adist9 DOUBLE, rn BIGINT, "
        "emb_fp BIGINT",
        pqt_rows,
    )
    _write_golden(
        con, "sim_ivfpq_residual_trained",
        "query_id BIGINT, vec_id BIGINT, adist9 DOUBLE, rn BIGINT, "
        "emb_fp BIGINT",
        pqrt_rows,
    )
    _write_golden(
        con, "sim_pq_opq_topk",
        "query_id BIGINT, vec_id BIGINT, adist9 DOUBLE, rn BIGINT, "
        "emb_fp BIGINT",
        opq_rows,
    )
    _write_golden(
        con, "sim_opq_aniso_win",
        "query_id BIGINT, opq_hits BIGINT, pq_hits BIGINT, emb_fp BIGINT",
        aniso_rows,
    )
    _write_golden(
        con, "sim_ivfpq_residual_opq",
        "query_id BIGINT, vec_id BIGINT, adist9 DOUBLE, rn BIGINT, "
        "emb_fp BIGINT",
        ropq_rows,
    )
    _write_golden(
        con, "sim_cascade_residual_opq",
        "query_id BIGINT, vec_id BIGINT, cosine DOUBLE, rn BIGINT, "
        "emb_fp BIGINT",
        ropqc_rows,
    )
    _write_golden(
        con, "stream_residual_opq_replay",
        "vec_id BIGINT, cell BIGINT, code BIGINT, gen BIGINT, "
        "emb_fp BIGINT",
        sropq_rows,
    )
    con.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
