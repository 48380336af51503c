"""Streaming mergeable sketches: maintain a fixed-size count-min sketch
over an unbounded document feed.

The point of sketching at 100 TB is MERGEABILITY: cells are plain sums,
so partial sketches from partitions, batches, or streaming micro-batches
combine by cell-wise addition, in any order, to exactly the sketch of the
union. This module is the streaming leg of that contract:

  * cluster side, per micro-batch: ``operators.textops.cms_sketch`` — the
    same fixed-size (row, bucket) hash aggregate the batch query uses, so
    shuffle volume per batch is bounded by DEPTH x WIDTH cells no matter
    the batch size;
  * driver side: cell-wise addition into a DEPTH x WIDTH numpy array
    (DEPTH*WIDTH = 1024 int64 cells — the whole sketch is ~8 KB; merging
    it per batch is O(cells), not O(tokens), which is exactly why the
    sketch is the right streaming accumulator where an exact counter
    table grows with vocabulary).

Estimates carry the standard CMS guarantee (never under-count; over-count
bounded by collisions) and — because the bucket hash is the shared
md5-derived arithmetic — are bit-identical to the batch query's estimates
over the same corpus. Reference parity: the reference keeps running
per-run totals only (M8, connectors/googleAnalyticsETL.js:36-70); a
frequency sketch is part of the scale extension surface.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

from tomixpanel_spark.operators.textops import CMS_DEPTH, CMS_WIDTH, cms_sketch


def _py_bucket(row: int, token: str) -> int:
    """Python mirror of ``operators.textops._cms_bucket`` (md5 first 8 hex
    digits -> int % WIDTH); equality is covered by the parity test."""
    h = int(hashlib.md5(f"{row}:{token}".encode()).hexdigest()[:8], 16)
    return h % CMS_WIDTH


class StreamingCountMin:
    """Count-min sketch accumulated across micro-batches.

    Usage::

        cms = StreamingCountMin()
        q = (stream.writeStream.outputMode("update")
             .foreachBatch(cms.update_batch)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        cms.estimate("the")
    """

    def __init__(self) -> None:
        import numpy as np

        self.cells = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype="int64")
        self.n_batches = 0

    def update_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch hook: aggregate the batch to its partial sketch on
        the cluster, merge the <=1024 returned cells here."""
        for r in cms_sketch(batch_df).collect():
            self.cells[r["row"], r["bucket"]] += r["c"]
        self.n_batches += 1

    def merge(self, other: "StreamingCountMin") -> "StreamingCountMin":
        """Cell-wise merge (e.g. sketches from parallel backfill jobs)."""
        self.cells += other.cells
        self.n_batches += other.n_batches
        return self

    def estimate(self, token: str) -> int:
        """Point frequency estimate: min over depth rows (never under the
        true count; over by at most the row's collision mass)."""
        return int(
            min(self.cells[r, _py_bucket(r, token)] for r in range(CMS_DEPTH))
        )
