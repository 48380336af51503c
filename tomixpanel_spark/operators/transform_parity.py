"""Oracle-checked runs of the REAL vendor transform code paths.

The vendor transforms (transforms/amplitude.py etc.) are covered by golden
fixture tests, but the driver's DuckDB gate only sees ``queries()``. These
queries synthesize vendor-shaped input FROM the events table with
SQL-mirrorable rules, push it through the actual transform functions, and
project scalar outputs the oracle can recompute — so the flagship
transform logic (T4 coalesce, T5 pair table, T6 precedence, T8 surrogate
keys, T12 custom-dimension naming) is hash-verified end-to-end, not just
unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, table
from tomixpanel_spark.schemas import AMP_EVENT_SCHEMA


def _synth_amp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> Amplitude-export-shaped rows (FIXTURES.md F1 null
    patterns via deterministic modular rules)."""
    # repartition before the heavy per-row map-building: the single-row-group
    # parquet file scans on one task, and the transform is CPU-bound
    ev = table(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "event_id"
    )
    e = F.col("event_id")
    u = F.col("user_id")
    shaped = ev.select(
        F.col("event_type"),
        F.when(u % 3 == 0, F.lit(None)).otherwise(F.concat(F.lit("user_"), u.cast("string"))).alias("user_id"),
        F.when(e % 10 == 9, F.lit(None)).otherwise(F.concat(F.lit("dev_"), (u % 50).cast("string"))).alias("device_id"),
        e.alias("amplitude_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_time"),
        F.when(e % 2 == 0, F.concat(F.lit("src-"), e.cast("string"))).alias("$insert_id"),
        F.when(u % 5 == 0, F.lit(None)).otherwise(F.lit("10.0.0.1")).alias("ip_address"),
        F.lit("sf").alias("city"),
        F.lit("ca").alias("region"),
        F.when(u % 4 == 0, F.lit(None)).otherwise(F.lit("us")).alias("country"),
        F.lit("en").alias("language"),
        F.when(u % 5 < 2, F.lit(None)).otherwise(F.lit("1.2.3")).alias("app_version"),
        F.when(u % 5 == 0, F.lit(None)).otherwise(F.lit("ios")).alias("os_name"),
        F.lit("14.1").alias("os_version"),
        F.lit("apple").alias("device_brand"),
        F.lit("apple").alias("device_manufacturer"),
        F.lit("iphone").alias("device_model"),
        F.create_map(F.lit("plan"), F.when(u % 2 == 0, F.lit("free")).otherwise(F.lit("pro"))).alias("event_properties"),
        F.when(
            e % 4 == 0,
            F.create_map(F.lit("plan"), F.lit("user-plan"), F.lit("tier"), F.lit("gold")),
        ).otherwise(F.create_map().cast("map<string,string>")).alias("user_properties"),
        F.create_map().cast("map<string,string>").alias("groups"),
        *[
            F.lit(None).cast("map<string,string>").alias(c)
            for c in ("group_properties", "global_user_properties", "data")
        ],
    )
    # pin column order/type to the canonical source schema
    return shaped.select(*[F.col(f"`{f.name}`") for f in AMP_EVENT_SCHEMA.fields])


def amp_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real transforms.amplitude.amp_events over synthesized export rows,
    projected to oracle-checkable scalars."""
    from tomixpanel_spark.transforms.amplitude import amp_events

    out = amp_events(_synth_amp(spark, sf_dir))
    p = F.col("props")
    return out.select(
        F.col("event"),
        F.col("distinct_id"),
        F.col("time_ms"),
        F.col("insert_id"),
        F.element_at(p, "plan").alias("plan"),
        F.element_at(p, "$os").alias("os"),
        F.element_at(p, "$browser").alias("browser"),
        F.element_at(p, "mp_country_code").alias("country_code"),
        F.element_at(p, "amplitude_id").alias("amp_id"),
        F.element_at(p, "$source").alias("source"),
    )


# The SQL mirror re-derives every rule: JS-falsy coalesce for identity,
# spread precedence for plan (user_properties beat event_properties),
# truthy-gated pair table, leftover scalars, canonical md5 fallback.
_AMP_TRANSFORM_SQL = """
WITH s AS (
  SELECT event_id, user_id AS u, event_type,
    CASE WHEN user_id % 3 = 0 THEN NULL ELSE 'user_' || CAST(user_id AS VARCHAR) END AS user_id,
    CASE WHEN event_id % 10 = 9 THEN NULL ELSE 'dev_' || CAST(user_id % 50 AS VARCHAR) END AS device_id,
    event_id AS amplitude_id,
    strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
    CASE WHEN event_id % 2 = 0 THEN 'src-' || CAST(event_id AS VARCHAR) ELSE NULL END AS src_insert_id,
    CASE WHEN user_id % 4 = 0 THEN NULL ELSE 'us' END AS country,
    CASE WHEN user_id % 5 = 0 THEN NULL ELSE 'ios' END AS os_name,
    CASE WHEN user_id % 2 = 0 THEN 'free' ELSE 'pro' END AS ep_plan,
    event_id % 4 = 0 AS has_up
  FROM events),
t AS (
  SELECT *,
    COALESCE(user_id, device_id, CAST(amplitude_id AS VARCHAR)) AS distinct_id,
    epoch_ms(CAST(event_time AS TIMESTAMP)) AS time_ms
  FROM s)
SELECT event_type AS event, distinct_id, time_ms,
  COALESCE(src_insert_id,
           md5(event_type || '|' || COALESCE(distinct_id, '') || '|' ||
               CAST(time_ms AS VARCHAR) || '|' || COALESCE(device_id, ''))) AS insert_id,
  CASE WHEN has_up THEN 'user-plan' ELSE ep_plan END AS plan,
  os_name AS os,
  os_name AS browser,
  country AS country_code,
  CAST(amplitude_id AS VARCHAR) AS amp_id,
  'amplitudeToMixpanel (by AK)' AS source
FROM t
"""


def custom_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 indexed custom-dimension naming over a synthesized {index,value}
    array: 'dimension #<index> (<eventName>)' keys, skipping na/empty
    (reference transform/gaToMixpanel.js:228-239)."""
    ev = table(spark, sf_dir, "events")
    e = F.col("event_id")
    dims = F.array(
        F.struct(
            F.lit("1").alias("index"),
            F.when(e % 3 == 0, F.lit("na")).when(e % 3 == 1, F.lit("")).otherwise(F.lit("red")).alias("value"),
        ),
        F.struct(F.lit("4").alias("index"), F.lit("blue").alias("value")),
    )
    named = F.map_from_entries(
        F.transform(
            F.filter(dims, lambda d: (F.lower(d["value"]) != "na") & (d["value"] != "")),
            lambda d: F.struct(
                F.concat(F.lit("dimension #"), d["index"], F.lit(" ("), F.col("event_type"), F.lit(")")).alias("key"),
                d["value"].alias("value"),
            ),
        )
    )
    return ev.select(
        "event_id",
        F.element_at(named, F.concat(F.lit("dimension #1 ("), F.col("event_type"), F.lit(")"))).alias("dim1"),
        F.element_at(named, F.concat(F.lit("dimension #4 ("), F.col("event_type"), F.lit(")"))).alias("dim4"),
        F.size(F.map_keys(named)).cast("bigint").alias("n_dims"),
    )


_CUSTOM_DIMS_SQL = """
SELECT event_id,
  CASE WHEN event_id % 3 NOT IN (0, 1) THEN 'red' ELSE NULL END AS dim1,
  'blue' AS dim4,
  CAST(CASE WHEN event_id % 3 NOT IN (0, 1) THEN 2 ELSE 1 END AS BIGINT) AS n_dims
FROM events
"""


REGISTRY = {
    "amp_transform": QuerySpec(amp_transform, _AMP_TRANSFORM_SQL, "T4+T5+T6+T8 e2e"),
    "custom_dims": QuerySpec(custom_dims, _CUSTOM_DIMS_SQL, "T12"),
}
