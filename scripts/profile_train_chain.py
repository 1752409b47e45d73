#!/usr/bin/env python3
"""Phase-by-phase wall-clock of the offline residual-OPQ training
chain over the aniso fixture (the chain `_ropq_published_index` runs
once per session; the most expensive sequential-job path in the
system — r12 OPTIMIZATION "Training-chain breakdown").

Usage: python scripts/profile_train_chain.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    import tempfile

    from hadoop_search_spark.session import get_spark
    from hadoop_search_spark import catalog as _cat
    from hadoop_search_spark.operators.similarity import (
        ivf_train_kmeans,
        pq_residual_opq_model,
        write_ivfpq_index,
    )

    spark = get_spark(app_name="profile_train_chain", cpus=CPUS)
    emb = _cat._t(spark, _cat._ANISO_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    emb.count()  # warm the scan

    t0 = time.time()
    cents = ivf_train_kmeans(emb, k=8, iterations=2)
    t1 = time.time()
    books, rot = pq_residual_opq_model(emb, cents, iterations=2)
    t2 = time.time()
    path = tempfile.mkdtemp(prefix="ropq_profile_")
    write_ivfpq_index(
        emb, path, centroids=cents, books=books,
        encoding="residual_opq", rotation=rot,
    )
    t3 = time.time()
    print(f"ivf_train_kmeans(k=8, 2 iters): {t1 - t0:7.2f} s")
    print(f"pq_residual_opq_model(2 iters): {t2 - t1:7.2f} s")
    print(f"write_ivfpq_index:              {t3 - t2:7.2f} s")
    print(f"TOTAL:                          {t3 - t0:7.2f} s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
