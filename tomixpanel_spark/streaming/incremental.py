"""Incremental / fused pipeline path (SURVEY.md §2.1 S9 + §2.2 K6).

The reference's "big data" GA path fuses extract-transform-load per line
with micro-batch flushes at 1,000 events / 10,000 profiles
(connectors/googleAnalyticsLineByLine.js:47-73) — hand-rolled streaming.

Engine: Structured Streaming file source + foreachBatch. New files landing
in the staging dir become micro-batches (``maxFilesPerTrigger`` plays the
flush-threshold role); each batch runs the SAME batch transform and sink —
no separate fused code path, because lazy evaluation already pipelines
narrow stages. Checkpointing gives exactly-once file processing, which
combined with deterministic $insert_id (T8) makes the whole incremental
pipeline idempotent end-to-end — the resumability the reference admits it
lacks (README.md:9).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream a staging dir through transform -> sink per micro-batch.

    ``available_now=True`` drains everything currently staged then stops
    (the batch-backfill mode, and what tests use); ``False`` runs
    continuously as new files land.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )

    def for_each_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink(transform(batch_df), batch_id)

    writer = (
        stream.writeStream.foreachBatch(for_each_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
