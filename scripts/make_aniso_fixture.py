#!/usr/bin/env python3
"""Generate the ANISOTROPIC embedding fixture —
``tests/fixtures/aniso/embeddings.parquet``.

The driver fixture (`/root/testdata/sf*/embeddings.parquet`) is
near-random: isotropic per-component noise, no cluster structure.
That's fine for CORRECTNESS (every ANN entry value-checks against its
oracle on it) but it understates — to the point of erasing — the
wins the quantization ladder exists for: on an isotropic corpus OPQ's
eigenvalue-balanced allocation is a statistical no-op (every
allocation is equally good), and IVF pruning has no clusters to
prune to. Real text/image embeddings are the opposite: their spectra
decay fast (a handful of directions carry most variance) and they
cluster. This fixture reproduces both properties deterministically:

* **decaying spectrum**: within-cluster covariance Λ with
  λ_i ∝ 1/i (the verdict-suggested shape; spread λ_1/λ_64 = 64),
* **cluster structure**: 16 centers drawn from N(0, 4Λ), rows =
  center + N(0, Λ) — between-cluster scatter dominates, so IVF cells
  align with real mass,
* **rotated off the coordinate axes**: one fixed orthogonal Q (QR of
  a seeded Gaussian) applied to everything — plain PQ's
  coordinate-block subspaces see correlated mixtures (what OPQ's
  learned rotation undoes); without this, coordinate subspaces are
  already PCA-aligned and OPQ has nothing to fix.

Everything derives from ONE seeded numpy generator — rerunning
reproduces the parquet bit-for-bit (fixed seed, fixed op order), so
the committed artifact and this script can't drift apart silently.

Schema matches the driver fixture (vec_id BIGINT, embedding
ARRAY<FLOAT>, label INT = true cluster id) so every recall harness
reads it unchanged: `python scripts/ann_quality.py tests/fixtures/aniso`.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = 2000
DIM = 64
N_CLUSTERS = 16
SEED = 20260815


def aniso_embeddings(
    n: int = N, dim: int = DIM, n_clusters: int = N_CLUSTERS,
    seed: int = SEED,
) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    lam = 1.0 / np.arange(1, dim + 1)  # eigenvalue spectrum λ_i ∝ i⁻¹
    sd = np.sqrt(lam)
    centers = rng.standard_normal((n_clusters, dim)) * (2.0 * sd)
    labels = rng.integers(0, n_clusters, size=n)
    x = centers[labels] + rng.standard_normal((n, dim)) * sd
    # one fixed orthogonal rotation so the principal axes are NOT
    # coordinate-aligned (sign-pinned so QR implementation details
    # can't flip columns between numpy builds)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    q = q * np.sign(np.diag(r))
    return (x @ q.T).astype(np.float32), labels.astype(np.int32)


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "tests", "fixtures", "aniso")
    os.makedirs(out_dir, exist_ok=True)
    x, labels = aniso_embeddings()
    table = pa.table(
        {
            "vec_id": pa.array(range(len(x)), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in x], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    out = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(table, out, compression="snappy")
    print(f"wrote {out}: {len(x)} vectors, dim={x.shape[1]}, "
          f"{N_CLUSTERS} clusters, spectrum 1/i")
    return 0


if __name__ == "__main__":
    sys.exit(main())
