"""Mixpanel -> Mixpanel (migration) and reverse-ETL projections.

Forward (reference connectors/mixpanelETL.js):
  * /export NDJSON events pass through unchanged (:87-93); optional
    source-side filters (date range / where / event list) belong to the
    source wrapper (sources.mixpanel), which Catalyst-pushes when reading
    staged files.
  * /engage pages -> profile upserts (:119-129): {$distinct_id,
    $properties} becomes {$token, $distinct_id, $ignore_time, $ip, $set}.

Reverse (reference load/sendOther.js):
  * mixpanel -> Amplitude HTTP API v2 (:166-186): user_id/device_id,
    event_type, time seconds->ms, insert_id, remaining props as
    event_properties.
  * mixpanel -> Woopra (:44-70): visitor{id} + one action per event,
    time seconds->ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# properties consumed into typed fields on the amplitude reshape
# (reference load/sendOther.js:166-186 deletes these from event_properties)
_AMP_RESERVED = ("distinct_id", "$device_id", "time", "$insert_id", "ip", "$source")


def mp_export_events(df: DataFrame) -> DataFrame:
    """/export rows {event, properties} -> canonical typed event."""
    p = F.col("properties")
    strip = _AMP_RESERVED
    props = F.map_filter(p, lambda k, v: ~k.isin(*strip))
    return df.select(
        F.col("event"),
        p["distinct_id"].alias("distinct_id"),
        (p["time"].cast("bigint") * 1000).alias("time_ms"),
        p["$insert_id"].alias("insert_id"),
        props.alias("props"),
    )


def mp_engage_profiles(pages: DataFrame, token: str | None = None) -> DataFrame:
    """/engage result pages -> profile upserts (one row per result)."""
    r = pages.select(F.explode("results").alias("r")).select("r.*")
    return r.select(
        F.lit(token).cast("string").alias("token"),
        F.col("`$distinct_id`").alias("distinct_id"),
        F.lit(None).cast("string").alias("ip"),
        F.col("`$properties`").alias("set"),
        F.lit(True).alias("ignore_time"),
    )


def mp_to_amplitude_events(df: DataFrame) -> DataFrame:
    """Canonical mp export rows -> Amplitude HTTP API v2 event shape."""
    p = F.col("properties")
    return df.select(
        p["distinct_id"].alias("user_id"),
        p["$device_id"].alias("device_id"),
        F.col("event").alias("event_type"),
        (p["time"].cast("bigint") * 1000).alias("time"),
        p["$insert_id"].alias("insert_id"),
        p["ip"].alias("ip"),
        F.map_filter(p, lambda k, v: ~k.isin(*_AMP_RESERVED)).alias(
            "event_properties"
        ),
    )


def mp_to_amplitude_users(profiles: DataFrame) -> DataFrame:
    """Profile rows -> Amplitude /identify shape."""
    return profiles.select(
        F.col("distinct_id").alias("user_id"),
        F.col("set").alias("user_properties"),
    )


def mp_to_woopra_events(df: DataFrame, project: str | None = None) -> DataFrame:
    """Canonical mp export rows -> Woopra visitor/actions shape."""
    p = F.col("properties")
    return df.select(
        F.lit(project).cast("string").alias("project"),
        F.struct(p["distinct_id"].alias("id")).alias("visitor"),
        F.array(
            F.struct(
                F.col("event").alias("name"),
                (p["time"].cast("bigint") * 1000).alias("timestamp"),
                F.map_filter(p, lambda k, v: ~k.isin(*_AMP_RESERVED)).alias(
                    "properties"
                ),
            )
        ).alias("actions"),
    )
