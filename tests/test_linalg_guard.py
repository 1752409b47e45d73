"""Mechanical enforcement of the deterministic-linalg rule (r10
precedent): ``np.linalg.eigh``'s LAPACK kernel dispatch returned
last-ulp-different eigenvectors across VM sessions, silently
invalidating every PCA/OPQ golden from r8 until the r10 audit caught
it live. The fix is the bit-stable cyclic Jacobi eigensolver
(``operators/similarity.py:_eigh_det`` / ``_jacobi_eigh`` and its
independent replay twin in ``scripts/make_goldens.py``). Any NEW
golden-path linear algebra must go through those kernels — this test
makes the rule a failing build instead of a convention, so LAPACK
dispatch can't silently reenter.

Scope: the package (every operator is potentially golden-checked)
plus the golden replay twin. Excluded by design:

* ``tests/`` — tolerance-style comparisons against LAPACK are fine
  (nothing a test computes is persisted as a golden);
* ``scripts/make_aniso_fixture.py`` — a one-shot generator whose
  OUTPUT is committed (``tests/fixtures/aniso``); goldens key on the
  committed bytes, so its arithmetic is frozen by the fixture itself.

``np.linalg.norm`` / matmul / solve-free numpy stays allowed — the
drift class is the eigendecomposition-family kernels (eig/eigh/
eigvals/eigvalsh/svd/qr), where LAPACK picks code paths at runtime.
"""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# call-site and import forms; prose mentions in comments/docstrings
# (no parenthesis / no import keyword) intentionally don't match
_CALL = re.compile(
    r"(?:np|numpy)\.linalg\.(?:eigh?|eigvalsh?|svd|qr)\s*\("
)
_IMPORT = re.compile(r"^\s*from\s+numpy\.linalg\s+import\b")

_GUARDED = [
    os.path.join(ROOT, "hadoop_search_spark"),
    os.path.join(ROOT, "scripts", "make_goldens.py"),
]


def _py_files(path):
    if os.path.isfile(path):
        yield path
        return
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def _violations():
    out = []
    for base in _GUARDED:
        for path in _py_files(base):
            with open(path) as f:
                for lineno, line in enumerate(f, start=1):
                    if _CALL.search(line) or _IMPORT.match(line):
                        out.append((os.path.relpath(path, ROOT), lineno,
                                    line.strip()))
    return out


def test_no_lapack_eigen_dispatch_in_golden_paths():
    bad = _violations()
    assert not bad, (
        "LAPACK eigen-family dispatch in a golden path — its runtime "
        "kernel selection drifts across machines/sessions and broke "
        "every PCA/OPQ golden in r8-r10. Use the deterministic "
        "kernels instead (operators/similarity.py:_eigh_det / "
        "_jacobi_eigh; replay twin in scripts/make_goldens.py): "
        f"{bad}"
    )


def test_guard_bites():
    """The patterns catch real call/import forms and ignore the prose
    mentions the package's docstrings legitimately carry."""
    assert _CALL.search("vals, vecs = np.linalg.eigh(cov)")
    assert _CALL.search("u, s, vt = numpy.linalg.svd(m)")
    assert _CALL.search("q, r = np.linalg.qr(a)")
    assert _IMPORT.match("from numpy.linalg import eigh")
    assert not _CALL.search("# replacing ``np.linalg.eigh`` per r10")
    assert not _CALL.search("np.linalg.norm(x, axis=1)")
