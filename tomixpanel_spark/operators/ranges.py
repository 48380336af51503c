"""Range join (point-in-interval): match each point row to the interval
rows containing it, per key — the second point-in-time operator class
engines ship natively (DuckDB IEJoin, Postgres ranges) and Spark lacks:
an inequality-only join falls back to BroadcastNestedLoopJoin (a per-key
cross product post-filtered row by row).

Spark-first composition — BIN BUCKETING, the standard production trick:
pick a bin width, replicate each interval onto the bins it covers
(``sequence`` + ``explode``; an interval of length L lands on
ceil(L/width)+1 bins), compute each point's single bin, then EQUI-join on
(key, bin) and post-filter the exact containment. Every (point, interval)
candidate pair meets exactly once (the point has one bin), so no dedup
pass. Cost: one shuffle each side on (key, bin) + replication factor
~avg_len/width — tunable; Catalyst gets a hash join instead of a nested
loop.

Oracle: DuckDB's native inequality join over the same derived inputs — an
independent evaluation strategy (IEJoin) checking the binning composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, table


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start: str,
    end: str,
    bin_width_s: int = 86_400,
) -> DataFrame:
    """Inner join of each ``points`` row to every ``intervals`` row of the
    same ``on`` key with ``start <= point_time <= end`` (inclusive both
    ends; timestamps). Returns all point columns + all interval columns
    (minus the key). ``bin_width_s`` trades interval replication against
    candidate-pair volume: set it near the typical interval length."""
    p_bin = (F.unix_seconds(F.col(point_time)) / bin_width_s).cast("bigint")
    i_bins = F.sequence(
        (F.unix_seconds(F.col(start)) / bin_width_s).cast("bigint"),
        (F.unix_seconds(F.col(end)) / bin_width_s).cast("bigint"),
    )
    overlap = set(points.columns) & set(intervals.columns) - {on}
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    p = points.select("*", p_bin.alias("__bin"))
    i = intervals.select("*", F.explode(i_bins).alias("__bin"))
    joined = p.join(i, [on, "__bin"]).filter(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.drop("__bin")


def range_join_active_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: per event, how many of the user's promo windows
    were active at the event time, and the highest-priority (max orderkey)
    active window. Windows derive deterministically from orders (start
    synthesized into the events range, length 1..48 hours) so both engines
    build the identical interval set."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = table(spark, sf_dir, "orders")
    win = orders.select(
        F.pmod("o_custkey", F.lit(150)).cast("bigint").alias("user_id"),
        F.expr(
            "timestampadd(HOUR, cast(o_orderkey % 720 as int), "
            "timestamp'2024-01-01 00:00:00')"
        ).alias("w_start"),
        F.expr(
            "timestampadd(HOUR, cast(o_orderkey % 720 + o_orderkey % 48 + 1 as int), "
            "timestamp'2024-01-01 00:00:00')"
        ).alias("w_end"),
        F.col("o_orderkey").alias("window_key"),
    )
    j = range_join(
        ev, win, on="user_id", point_time="ts", start="w_start", end="w_end",
        bin_width_s=86_400,
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.max("window_key").alias("top_window"),
    )


_RANGE_JOIN_SQL = """
WITH win AS (
  SELECT o_custkey % 150 AS user_id,
         TIMESTAMP '2024-01-01 00:00:00' + (o_orderkey % 720) * INTERVAL 1 HOUR AS w_start,
         TIMESTAMP '2024-01-01 00:00:00' + (o_orderkey % 720 + o_orderkey % 48 + 1) * INTERVAL 1 HOUR AS w_end,
         o_orderkey AS window_key
  FROM orders)
SELECT e.event_id, e.user_id, COUNT(*) AS n_active, max(w.window_key) AS top_window
FROM events e JOIN win w
  ON e.user_id = w.user_id AND e.ts >= w.w_start AND e.ts <= w.w_end
GROUP BY e.event_id, e.user_id
"""


REGISTRY = {
    "range_join_active_windows": QuerySpec(
        range_join_active_windows,
        _RANGE_JOIN_SQL,
        "custom operator: bin-bucketed range join",
    ),
}
