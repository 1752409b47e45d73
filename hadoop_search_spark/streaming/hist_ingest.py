"""Streaming quantile maintenance — an equi-width histogram store
summed per micro-batch.

The quantile twin of `streaming/cms_ingest.py`: each micro-batch is
sketched (`operators/sketch.py:hist_sketch` — one map + combine to
≤ B bucket rows under FROZEN [lo, hi) bounds) and merged into the
published store by bucket-wise SUM. State is a fixed ≤ B-row table
forever, answering "where does the rank-q value sit, over everything
ever ingested" (via `hist_quantile_bounds`) — the latency/size/score
distribution monitor an ingest pipeline wants at 100 TB where exact
percentiles would mean a full sort of history.

Bounds are frozen at store creation (domain knowledge or a bounds
pass over the build corpus — the frozen-quantizer contract the IVF
stores follow): later batches exceeding them clamp into the edge
buckets, degrading the edge VALUE bracket but never the rank math.
A drifted distribution is visible as edge-bucket mass — the rebuild
signal, same story as `ivfpq_drift_stats`.

Store protocol: versioned dirs + ``_CURRENT`` pointer + epoch
ledger, with the CMS ordering — SUM merge is NOT replay-idempotent,
so the ledger marker lands BEFORE the pointer flips, the
ledger-written/pointer-behind window self-heals by re-flip, and a
pre-ledger orphan dir is swept on replay (see
`streaming/cms_ingest.py` for the full window walk-through).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hadoop_search_spark.operators.sketch import (
    HIST_BUCKETS,
    hist_merge,
    hist_quantile_bounds,
    hist_sketch,
)


def _current_version(root: str) -> int | None:
    ptr = os.path.join(root, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip()[1:])


class StreamingHistogram:
    """Maintains an equi-width histogram store for one numeric column
    of a stream, under bounds FROZEN at construction."""

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        col: str,
        lo: float,
        hi: float,
        buckets: int = HIST_BUCKETS,
    ) -> None:
        if hi < lo:
            raise ValueError(f"need hi >= lo, got [{lo}, {hi}]")
        self.spark = spark
        self.store_root = store_root
        self.col = col
        self.lo = float(lo)
        self.hi = float(hi)
        self.buckets = buckets
        os.makedirs(os.path.join(store_root, "epochs"), exist_ok=True)

    # -- store access ---------------------------------------------------

    def sketch(self) -> DataFrame | None:
        """The current published (bucket, cnt) table (None before the
        first commit)."""
        v = _current_version(self.store_root)
        if v is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.store_root, f"v{v}", "buckets")
        )

    def quantiles(self, qs: list[float]) -> DataFrame | None:
        """Quantile brackets over everything ingested so far (None
        before the first commit)."""
        sk = self.sketch()
        if sk is None:
            return None
        return hist_quantile_bounds(sk, qs, self.lo, self.hi, self.buckets)

    # -- the merge step ---------------------------------------------------

    def _ledger_path(self, epoch_id: int) -> str:
        return os.path.join(self.store_root, "epochs", str(int(epoch_id)))

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        ledger = self._ledger_path(epoch_id)
        if os.path.exists(ledger):
            # replay of a committed epoch — no-op, plus the CMS-store
            # torn-state self-heal (ledger names a complete version the
            # pointer never reached: re-flip, never re-merge)
            with open(ledger) as f:
                named = f.read().strip()
            if named:
                v = int(named[1:])
                done = os.path.join(
                    self.store_root, f"v{v}", "buckets", "_SUCCESS"
                )
                cur = _current_version(self.store_root)
                if os.path.exists(done) and (cur is None or cur < v):
                    self._flip(v)
            return
        cur = _current_version(self.store_root)
        if batch.isEmpty():
            self._mark(ledger, cur)
            return
        sketch = hist_sketch(batch, self.col, self.lo, self.hi, self.buckets)
        prev = self.sketch()
        merged = sketch if prev is None else hist_merge(prev, sketch)
        version = 0 if cur is None else cur + 1
        out = os.path.join(self.store_root, f"v{version}")
        if os.path.exists(out):
            shutil.rmtree(out)  # orphan from a pre-ledger crash
        merged.coalesce(1).write.parquet(os.path.join(out, "buckets"))
        # ledger BEFORE pointer: sum-merge, replaying would double-count
        self._mark(ledger, version)
        self._flip(version)

    def _flip(self, version: int) -> None:
        tmp = os.path.join(self.store_root, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"v{version}")
        os.replace(tmp, os.path.join(self.store_root, "_CURRENT"))

    @staticmethod
    def _mark(ledger: str, version: int | None) -> None:
        tmp = ledger + ".tmp"
        with open(tmp, "w") as f:
            f.write("" if version is None else f"v{version}")
        os.replace(tmp, ledger)

    def start(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )
