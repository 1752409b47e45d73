"""Streaming frequency maintenance — a Count-Min cell store summed
per micro-batch.

The frequency twin of `streaming/hll_ingest.py`: each micro-batch is
sketched (`operators/sketch.py:cms_sketch` — map + combine to ≤ d·w
cells) and merged into the published store by cell-wise SUM. State is
a fixed d·w-cell table forever, answering "how often has THIS value
appeared, ever" for any value without per-key state — the
frequency-cap / repeated-document signal an ingest pipeline wants at
100 TB where exact per-key counters would grow with the key space.

Store protocol: versioned dirs + ``_CURRENT`` pointer + epoch ledger,
as everywhere. One DELIBERATE difference from the HLL counter: SUM
merge is NOT replay-idempotent — merging a batch twice DOUBLES its
contribution — so correctness rests entirely on the ledger fence, and
the ledger marker must land BEFORE the pointer flips. Windows:

* ledger written, pointer NOT flipped (crash between) → the replay
  no-ops on the ledger and the store keeps serving the previous
  version; the orphan ``v{n}`` dir is swept by the NEXT epoch. The
  epoch's increments are lost with its marker present — so the marker
  records the version it committed, and :meth:`process_batch` heals
  this torn state by re-flipping the pointer to the ledger's version
  when the dir is complete (the committed-but-unmarked self-heal of
  `streaming/ivf_ingest.py`, mirrored);
* version dir written, ledger NOT written → dir is an orphan, swept
  and rebuilt on replay (the pointer still names the old version, so
  the double-merge never becomes visible).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hadoop_search_spark.operators.sketch import (
    CMS_D,
    CMS_W,
    cms_merge,
    cms_query,
    cms_sketch,
)


def _current_version(root: str) -> int | None:
    ptr = os.path.join(root, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip()[1:])


class StreamingCmsCounter:
    """Maintains a Count-Min cell store for one column of a stream."""

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        col: str,
        d: int = CMS_D,
        w: int = CMS_W,
    ) -> None:
        self.spark = spark
        self.store_root = store_root
        self.col = col
        self.d = d
        self.w = w
        os.makedirs(os.path.join(store_root, "epochs"), exist_ok=True)

    # -- store access ---------------------------------------------------

    def cells(self) -> DataFrame | None:
        v = _current_version(self.store_root)
        if v is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.store_root, f"v{v}", "cells")
        )

    def counts(self, values: DataFrame, col: str | None = None) -> DataFrame | None:
        """Point-query the store → (value, est); None before the
        first commit."""
        sk = self.cells()
        if sk is None:
            return None
        return cms_query(sk, values, col or self.col, self.d, self.w)

    # -- the merge step ---------------------------------------------------

    def _ledger_path(self, epoch_id: int) -> str:
        return os.path.join(self.store_root, "epochs", str(int(epoch_id)))

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        ledger = self._ledger_path(epoch_id)
        if os.path.exists(ledger):
            # replay of a committed epoch. Heal the torn
            # ledger-written/pointer-not-flipped state: if the ledger
            # names a version whose dir is complete but the pointer is
            # behind, re-flip (idempotent; never re-merges).
            with open(ledger) as f:
                named = f.read().strip()
            if named:
                v = int(named[1:])
                done = os.path.join(
                    self.store_root, f"v{v}", "cells", "_SUCCESS"
                )
                cur = _current_version(self.store_root)
                if os.path.exists(done) and (cur is None or cur < v):
                    self._flip(v)
            return
        cur = _current_version(self.store_root)
        if batch.isEmpty():
            self._mark(ledger, cur)
            return
        sketch = cms_sketch(batch, self.col, self.d, self.w)
        prev = self.cells()
        merged = sketch if prev is None else cms_merge(prev, sketch)
        version = 0 if cur is None else cur + 1
        out = os.path.join(self.store_root, f"v{version}")
        if os.path.exists(out):
            shutil.rmtree(out)  # orphan from a pre-ledger crash
        merged.coalesce(1).write.parquet(os.path.join(out, "cells"))
        # ledger BEFORE pointer: a replay must no-op the moment the
        # merge is durable, because re-merging would double-count
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
