"""Oracle-checked STREAMING query: the continuous-aggregate maintenance
path (streaming/cagg.py) run through a real Structured Streaming job and
hash-compared against the equivalent batch SQL.

Until round 8 the streaming layer (7 modules) was pytest-only — the one
layer with no external correctness signal. This query closes that: it
stages a bounded slice of ``events`` as THREE parquet files, streams them
through ``readStream`` + ``foreachBatch`` (maxFilesPerTrigger=1, so the
store merges three incremental generations exactly as a live pipeline
would), then returns the store's hourly() read. The DuckDB oracle is the
plain batch aggregate over the same slice — so the driver's hash check
proves stream-merge == batch for counts AND DECIMAL sums, across
micro-batch boundaries, through the manifest commit protocol.

Slice bound: the first 3 days of events (ts < min(ts) + 3 days, both
engines compute the bound from the data) — keeps the per-batch day-
partition rewrites proportional to the slice, not the table's full time
span; the semantics under test (incremental exactly-once merge) don't
depend on span.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, table

N_STREAM_BATCHES = 3
SLICE_DAYS = 3


def _stage_batches(ev: DataFrame, land: str) -> None:
    """Write the slice as N_STREAM_BATCHES single parquet files into one
    landing dir (the file-source's unit of micro-batching). Each split is
    written distributed, then its part file moved up as b<i>.parquet."""
    for b in range(N_STREAM_BATCHES):
        part_dir = os.path.join(land, f"_stage_b{b}")
        (
            ev.filter(F.pmod(F.col("event_id"), F.lit(N_STREAM_BATCHES)) == b)
            .select("ts", "event_type", "value")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        [part] = [p for p in os.listdir(part_dir) if p.endswith(".parquet")]
        os.replace(
            os.path.join(part_dir, part), os.path.join(land, f"b{b}.parquet")
        )
        shutil.rmtree(part_dir, ignore_errors=True)


_LANDING_CACHE: dict[tuple, str] = {}


def _staged_landing(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the staged landing dir for one sf_dir. Staging is
    FIXTURE synthesis — the harness stand-in for files landing from an
    upstream producer — so under TOMIX_CACHE_TABLES (the fixture-cache
    flag, same policy as the synthesized amp/GA inputs) it builds once
    per session; the STREAM + incremental merge, the product under test,
    re-runs fully on every call either way."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LANDING_CACHE.get(key)
    if cached and os.environ.get("TOMIX_CACHE_TABLES") and os.path.isdir(cached):
        return cached
    if cached:
        # uncached mode re-stages every call: reclaim the previous
        # landing tree instead of leaking one mkdtemp per invocation
        shutil.rmtree(os.path.dirname(cached), ignore_errors=True)
    ev = table(spark, sf_dir, "events")
    # slice bound computed from the data (deterministic; oracle mirrors
    # it with a scalar subquery)
    [row] = ev.agg(F.min("ts").alias("mn")).collect()
    bound = ev.filter(
        F.col("ts") < F.lit(row["mn"]) + F.expr(f"INTERVAL {SLICE_DAYS} DAYS")
    )
    land = os.path.join(tempfile.mkdtemp(prefix="tomix_cagg_land_"), "landing")
    os.makedirs(land)
    _stage_batches(bound, land)
    _LANDING_CACHE[key] = land
    return land


def streaming_cagg_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tomixpanel_spark.streaming.cagg import ContinuousAggregate

    land = _staged_landing(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="tomix_cagg_q_")

    cagg = ContinuousAggregate(os.path.join(work, "store"))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(cagg.update_batch)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_cagg_parity: availableNow stream did not finish in "
            "300s — refusing to read a mid-stream store (a partial read "
            "would surface as a false oracle mismatch)"
        )
    hourly = cagg.hourly(spark)
    return hourly.select(
        F.col("bucket").cast("string").alias("bucket_start"),
        F.col("key").alias("event_type"),
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


_STREAMING_CAGG_SQL = f"""
WITH sliced AS (
  SELECT * FROM events
  WHERE ts < (SELECT MIN(ts) FROM events) + INTERVAL {SLICE_DAYS} DAY)
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DECIMAL(28,6)) AS DOUBLE)
         AS sum_value
FROM sliced
GROUP BY 1, 2
"""


REGISTRY = {
    "streaming_cagg_parity": QuerySpec(
        streaming_cagg_parity,
        _STREAMING_CAGG_SQL,
        "streaming: incremental cagg merge == batch aggregate",
    ),
}
