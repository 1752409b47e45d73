"""Streaming distinct-count maintenance — a HyperLogLog register
store merged per micro-batch.

The batch sketch (`operators/sketch.py`) makes distinct-counting a
≤ 2^p-row register table; the streaming form maintains that table
across epochs: each micro-batch sketches its own rows (one narrow
map + one p-bit-key aggregation — never the corpus) and MERGES into
the published store by register-wise max. State is constant-size
forever — the property that lets "distinct URLs seen, ever" run as a
stream at 100 TB where exact distinct state would grow with the data.

Store protocol is the repo's versioned-directory + ``_CURRENT``
pointer (`streaming/dsir_ingest.py:publish_dsir_weights`): each epoch
publishes ``{root}/v{n}/registers`` and flips the pointer after the
write lands; an ``epochs/{e}`` ledger marker records which epoch
produced which version for replay no-ops.

Crash windows, in protocol order:

* version dir written, pointer NOT flipped → the orphan ``v{n}`` is
  swept and rewritten on replay (same as the DSIR publisher);
* pointer flipped, ledger marker NOT written → the replayed epoch
  merges its batch AGAIN into a fresh version — and the store value
  is UNCHANGED, because HLL merge is idempotent (register-wise max:
  ``merge(S, sketch(B))`` twice == once). This sink is exactly-once
  by ALGEBRA, with the ledger only keeping version lineage tidy; the
  double-merge window other stores must fence with ``_SUCCESS``
  ordering simply cannot corrupt a max-merge (pinned by test).

Scale shape per batch: sketch = map + map-side-combined aggregation
to ≤ 2^p rows; merge = union with a ≤ 2^p-row table + the same
aggregation; write = one coalesced file. No driver-side state, no
growth, no shuffle wider than 2^p rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hadoop_search_spark.operators.sketch import (
    HLL_P,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _current_version(root: str) -> int | None:
    ptr = os.path.join(root, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip()[1:])


class StreamingHllCounter:
    """Maintains a distinct-count register store for one column of a
    document/event stream. Wire with :meth:`start`, or call
    :meth:`process_batch` from an existing foreachBatch body."""

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        col: str,
        p: int = HLL_P,
    ) -> None:
        self.spark = spark
        self.store_root = store_root
        self.col = col
        self.p = p
        os.makedirs(os.path.join(store_root, "epochs"), exist_ok=True)

    # -- store access ---------------------------------------------------

    def registers(self) -> DataFrame | None:
        """The current published register table (None before the
        first commit)."""
        v = _current_version(self.store_root)
        if v is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.store_root, f"v{v}", "registers")
        )

    def estimate(self) -> DataFrame | None:
        """One-row ``(m, n_zero, z_scaled, est_distinct)`` summary of
        the store (None before the first commit)."""
        regs = self.registers()
        return None if regs is None else hll_estimate(regs, self.p)

    # -- the merge step ---------------------------------------------------

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        ledger = os.path.join(self.store_root, "epochs", str(int(epoch_id)))
        if os.path.exists(ledger):
            return  # replay of a committed epoch: no-op
        cur = _current_version(self.store_root)
        if batch.isEmpty():
            # nothing to merge; commit the epoch against the current
            # version so a replay of this empty epoch stays a no-op
            self._mark(ledger, cur)
            return
        sketch = hll_registers(batch, self.col, self.p)
        prev = self.registers()
        merged = sketch if prev is None else hll_merge(prev, sketch)
        version = 0 if cur is None else cur + 1
        out = os.path.join(self.store_root, f"v{version}")
        if os.path.exists(out):
            shutil.rmtree(out)  # orphan from a pre-flip crash
        merged.coalesce(1).write.parquet(os.path.join(out, "registers"))
        tmp = os.path.join(self.store_root, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"v{version}")
        os.replace(tmp, os.path.join(self.store_root, "_CURRENT"))
        self._mark(ledger, version)

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
