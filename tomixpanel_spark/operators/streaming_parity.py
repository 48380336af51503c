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


def _stage_json_batches(df: DataFrame, land: str, split_col: str, n: int) -> None:
    """Write ``df`` as ``n`` single NDJSON files (the json file-source's
    micro-batch unit), split by a deterministic modular rule."""
    for b in range(n):
        part_dir = os.path.join(land, f"_stage_b{b}")
        (
            df.filter(F.pmod(F.col(split_col), F.lit(n)) == b)
            .coalesce(1)
            .write.mode("overwrite")
            .json(part_dir)
        )
        [part] = [p for p in os.listdir(part_dir) if p.startswith("part-")]
        os.replace(os.path.join(part_dir, part), os.path.join(land, f"b{b}.json"))
        shutil.rmtree(part_dir, ignore_errors=True)


_AMP_LANDING_CACHE: dict[tuple, str] = {}


def _staged_amp_landing(spark: SparkSession, sf_dir: str) -> str:
    """Stage the synthesized Amplitude export (transform_parity's F1
    fixture) as NDJSON micro-batch files — the reference's on-disk shape
    for the fused line-by-line path. Fixture synthesis caches under
    TOMIX_CACHE_TABLES (same policy as _staged_landing)."""
    key = (spark.sparkContext.applicationId, sf_dir, "amp")
    cached = _AMP_LANDING_CACHE.get(key)
    if cached and os.environ.get("TOMIX_CACHE_TABLES") and os.path.isdir(cached):
        return cached
    if cached:
        shutil.rmtree(os.path.dirname(cached), ignore_errors=True)
    from tomixpanel_spark.operators.transform_parity import _synth_amp

    land = os.path.join(tempfile.mkdtemp(prefix="tomix_incr_land_"), "landing")
    os.makedirs(land)
    # amplitude_id carries event_id through the export shape — the only
    # integer column, so it is the split key
    _stage_json_batches(
        _synth_amp(spark, sf_dir), land, "amplitude_id", N_STREAM_BATCHES
    )
    _AMP_LANDING_CACHE[key] = land
    return land


def streaming_incremental_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused incremental path (S9 line-by-line scan + K6 micro-batch
    flush, reference connectors/googleAnalyticsLineByLine.js:47-73) under
    an EXTERNAL oracle: the staged Amplitude export streams through
    ``run_incremental`` (readStream json + foreachBatch) running the REAL
    ``amp_events`` transform per micro-batch into an append sink; the
    query returns the sink's contents. The DuckDB oracle is the batch
    transform SQL over the same rows — a row-wise transform over a
    disjoint micro-batch partition must union to exactly the batch
    result, whatever the batch boundaries."""
    from tomixpanel_spark.operators.transform_parity import _amp_output_columns
    from tomixpanel_spark.schemas import AMP_EVENT_SCHEMA
    from tomixpanel_spark.streaming.incremental import run_incremental
    from tomixpanel_spark.transforms.amplitude import amp_events

    land = _staged_amp_landing(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="tomix_incr_q_")
    out_dir = os.path.join(work, "out")

    def transform(batch: DataFrame) -> DataFrame:
        return amp_events(batch).select(*_amp_output_columns())

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    q = run_incremental(
        spark,
        land,
        AMP_EVENT_SCHEMA,
        transform,
        sink,
        checkpoint_dir=os.path.join(work, "ck"),
        max_files_per_trigger=1,
        available_now=True,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_incremental_parity: availableNow stream did not "
            "finish in 300s — refusing to read a partial sink"
        )
    return spark.read.parquet(out_dir)


REGISTRY = {
    "streaming_cagg_parity": QuerySpec(
        streaming_cagg_parity,
        _STREAMING_CAGG_SQL,
        "streaming: incremental cagg merge == batch aggregate",
    ),
    "streaming_incremental_parity": QuerySpec(
        streaming_incremental_parity,
        None,  # set below: shares amp_transform's oracle verbatim
        "streaming: fused incremental transform == batch transform",
    ),
}


def _late_bind_amp_oracle() -> None:
    """The oracle is EXACTLY transform_parity's _AMP_TRANSFORM_SQL (the
    stream is a partition of the same synthesized rows through the same
    transform); bind lazily to keep import order acyclic."""
    from tomixpanel_spark.operators import transform_parity

    REGISTRY["streaming_incremental_parity"] = QuerySpec(
        streaming_incremental_parity,
        transform_parity._AMP_TRANSFORM_SQL,
        "streaming: fused incremental transform == batch transform",
    )


_late_bind_amp_oracle()
