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

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, derived, ensure_parallel, table
from tomixpanel_spark.schemas import AMP_EVENT_SCHEMA


def _synth_amp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> Amplitude-export-shaped rows (FIXTURES.md F1 null
    patterns via deterministic modular rules).

    Cached as a derived view (TOMIX_CACHE_TABLES): the synthesized export
    rows are fixture INPUT to the transform under test — building them is
    harness cost, not product cost, so the bench reuses one materialized
    copy the way a real run reads a staged export once."""
    return derived(
        spark, ("synth_amp", sf_dir), lambda: _synth_amp_build(spark, sf_dir), kind="fixture"
    )


def _synth_amp_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize before the heavy per-row map-building: the transform the
    # fixture feeds is CPU-bound, so spread to FULL parallelism (the
    # fixture is built once and cached; the one-time shuffle is harness
    # cost, the downstream per-row map assembly is what's being timed)
    ev = table(spark, sf_dir, "events")
    ev = ensure_parallel(ev, "event_id", min_parts=spark.sparkContext.defaultParallelism)
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
    return out.select(*_amp_output_columns())


@lru_cache(maxsize=1)
def _amp_output_columns() -> tuple:
    """Constant projection tree; memoized — rebuilding Columns is pure
    py4j round-trip cost paid on every registered-query call otherwise."""
    p = F.col("props")
    return (
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




def _synth_ga_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> GA360-session-shaped rows: one session per (user_id, day),
    hits = that day's events in (ts, event_id) order as nested structs.

    Construction is SQL-mirrorable: every derived value is a deterministic
    function of the events row set (offsets from the per-group min ts,
    modular null patterns), so the oracle can re-derive the transform's
    outputs without materializing the nested intermediate.

    Cached as a derived view: the collect_list sessionization is fixture
    synthesis (harness, not product — a real GA run READS nested sessions
    from the export), so the bench builds the nested input once and the
    timed query exercises the actual ga_events transform.
    """
    return derived(
        spark, ("synth_ga", sf_dir), lambda: _synth_ga_sessions_build(spark, sf_dir), kind="fixture"
    )


def _synth_ga_sessions_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ev = ensure_parallel(ev, "user_id", min_parts=spark.sparkContext.defaultParallelism)
    e = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_millis("ts").alias("t_ms"),
        "event_id",
        "event_type",
    )
    grouped = e.groupBy("user_id", "day").agg(
        F.min("t_ms").alias("start_ms"),
        F.array_sort(
            F.collect_list(F.struct("t_ms", "event_id", "event_type"))
        ).alias("evs"),
    )
    hit = lambda x, i: F.struct(  # noqa: E731
        (i + 1).cast("string").alias("hitNumber"),
        (x["t_ms"] - F.col("start_ms")).cast("string").alias("time"),
        F.lit(None).cast("string").alias("hour"),
        F.lit(None).cast("string").alias("minute"),
        F.lit(True).alias("isInteraction"),
        (i == 0).alias("isEntrance"),
        F.lit(None).cast("boolean").alias("isExit"),
        F.lit(None).cast("string").alias("referer"),
        F.lit("PAGE").alias("type"),
        F.lit(None).cast("struct<pagePath:string,hostname:string,pageTitle:string>").alias("page"),
        F.when(
            x["event_id"] % 3 != 0,
            F.struct(
                F.lit("interaction").alias("eventCategory"),
                F.when(x["event_id"] % 3 == 1, F.lit("na"))
                .otherwise(x["event_type"])
                .alias("eventAction"),
                F.lit(None).cast("string").alias("eventLabel"),
            ),
        ).alias("eventInfo"),
        F.lit(None).cast("array<map<string,string>>").alias("product"),
        F.lit(None).cast("array<map<string,string>>").alias("promotion"),
        F.lit(None).cast("map<string,string>").alias("transaction"),
        F.lit(None).cast("map<string,string>").alias("social"),
        F.array(
            F.struct(
                F.lit("7").alias("index"),
                F.when(x["event_id"] % 4 == 0, F.lit("na"))
                .otherwise(F.concat(F.lit("v"), (x["event_id"] % 9).cast("string")))
                .alias("value"),
            )
        ).alias("customDimensions"),
        F.lit(None).cast("array<struct<index:string,value:string>>").alias("customMetrics"),
        F.lit(None).cast("array<struct<index:string,value:string>>").alias("customVariables"),
    )
    u = F.col("user_id")
    return grouped.select(
        F.lit("1").alias("visitNumber"),
        F.concat(F.lit("visit_"), u.cast("string"), F.lit("_"), F.col("day").cast("string")).alias("visitId"),
        F.expr("start_ms div 1000").cast("string").alias("visitStartTime"),
        F.col("day").cast("string").alias("date"),
        F.concat(F.lit("fv"), (u % 7).cast("string")).alias("fullVisitorId"),
        F.when(u % 3 == 0, F.lit(None)).otherwise(F.concat(F.lit("gu"), u.cast("string"))).alias("userId"),
        F.lit(None).cast("string").alias("visitorId"),
        F.lit(None).cast("string").alias("client_id"),
        F.lit("Organic Search").alias("channelGrouping"),
        F.lit(None).cast("string").alias("socialEngagementType"),
        F.struct(
            F.lit("1").alias("visits"),
            F.size("evs").cast("string").alias("hits"),
            F.lit(None).cast("string").alias("pageviews"),
            F.lit(None).cast("string").alias("timeOnSite"),
        ).alias("totals"),
        F.struct(
            F.lit(None).cast("string").alias("campaign"),
            F.lit("google").alias("source"),
            F.lit("organic").alias("medium"),
            F.when(u % 2 == 0, F.lit("shoes")).alias("keyword"),
            F.lit(None).cast("string").alias("adContent"),
            F.lit(None).cast("string").alias("campaignCode"),
            F.lit(None).cast("string").alias("referralPath"),
            F.lit(None).cast("boolean").alias("isTrueDirect"),
            F.lit(None).cast("struct<criteriaParameters:string>").alias("adwordsClickInfo"),
        ).alias("trafficSource"),
        F.struct(
            F.lit("Chrome").alias("browser"),
            F.lit(None).cast("string").alias("browserSize"),
            F.lit(None).cast("string").alias("browserVersion"),
            F.lit("desktop").alias("deviceCategory"),
            F.lit(None).cast("string").alias("mobileDeviceInfo"),
            F.lit(None).cast("string").alias("mobileDeviceModel"),
            F.lit("Macintosh").alias("operatingSystem"),
            F.lit(None).cast("string").alias("operatingSystemVersion"),
            F.lit(None).cast("string").alias("mobileDeviceBranding"),
            F.lit("en-us").alias("language"),
            F.lit(None).cast("string").alias("screenResolution"),
            F.lit(False).alias("isMobile"),
        ).alias("device"),
        F.struct(
            F.lit(None).cast("string").alias("continent"),
            F.lit(None).cast("string").alias("subContinent"),
            F.when(u % 4 != 0, F.lit("United States")).alias("country"),
            F.lit(None).cast("string").alias("region"),
            F.lit(None).cast("string").alias("metro"),
            F.lit("San Francisco").alias("city"),
            F.when(u % 3 == 0, F.lit("37.77")).alias("latitude"),
            F.when(u % 3 == 0, F.lit("-122.41")).alias("longitude"),
        ).alias("geoNetwork"),
        F.lit(None).cast("array<struct<index:string,value:string>>").alias("customDimensions"),
        F.transform(F.col("evs"), hit).alias("hits"),
    )


def ga_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real transforms.ga.ga_events over synthesized nested sessions —
    oracle-checks the explode, boundary synthesis, 0-offset bump, naming
    chain, default-prop tables, and custom-dimension naming end-to-end."""
    from tomixpanel_spark.transforms.ga import ga_events

    # the synth fixture is built to GA_SESSION_SCHEMA already and
    # ga_events resolves columns by NAME — the old reorder-select to the
    # schema's field order changed nothing downstream while costing one
    # full analyzer pass over the (deep) synth plan per build
    sessions = _synth_ga_sessions(spark, sf_dir)
    out = ga_events(sessions)
    return out.select(*_ga_output_columns())


@lru_cache(maxsize=1)
def _ga_output_columns() -> tuple:
    p = F.col("props")
    return (
        F.col("event"),
        F.col("distinct_id"),
        F.col("time_ms"),
        F.element_at(p, "$browser").alias("browser"),
        F.element_at(p, "utm_keyword").alias("keyword"),
        F.element_at(p, "mp_country_code").alias("country_code"),
        F.element_at(p, "UTM Channel").alias("utm_channel"),
    )


_GA_TRANSFORM_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, epoch_ms(ts) AS t_ms, event_id, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY epoch_ms(ts), event_id) AS seq
  FROM events),
g AS (
  SELECT user_id, day, min(t_ms) AS min_ms,
         CAST(CAST(floor(min(t_ms) / 1000) AS BIGINT) * 1000 AS BIGINT) AS start_ms,
         max(t_ms) AS max_ms, COUNT(*) AS n
  FROM e GROUP BY 1, 2),
ids AS (
  SELECT *, COALESCE(CASE WHEN user_id % 3 = 0 THEN NULL
                          ELSE 'gu' || CAST(user_id AS VARCHAR) END,
                     'fv' || CAST(user_id % 7 AS VARCHAR)) AS distinct_id
  FROM g),
hits AS (
  SELECT ids.user_id, ids.day, ids.distinct_id, ids.start_ms,
         e.t_ms - ids.min_ms AS off, e.event_id, e.event_type, e.seq
  FROM e JOIN ids ON e.user_id = ids.user_id AND e.day = ids.day),
hit_events AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 'PAGE'
              WHEN event_id % 3 = 1 THEN 'interaction'
              ELSE event_type END AS event,
         distinct_id,
         start_ms + (CASE WHEN off = 0 THEN 1000 ELSE off END) AS time_ms,
         user_id
  FROM hits),
bounds AS (
  SELECT 'session begins' AS event, distinct_id, start_ms AS time_ms, user_id FROM ids
  UNION ALL
  SELECT 'session ends', distinct_id,
         start_ms + (CASE WHEN max_ms - min_ms = 0 THEN 1000 ELSE max_ms - min_ms END) + 1000,
         user_id
  FROM ids),
allev AS (
  SELECT * FROM hit_events UNION ALL SELECT * FROM bounds)
SELECT event, distinct_id, time_ms,
  'Chrome' AS browser,
  CASE WHEN user_id % 2 = 0 THEN 'shoes' ELSE NULL END AS keyword,
  CASE WHEN user_id % 4 <> 0 THEN 'United States' ELSE NULL END AS country_code,
  'Organic Search' AS utm_channel
FROM allev
"""


def amp_profiles_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 (amp side): real transforms.amplitude.amp_profiles over the
    synthesized export — the $set shaping (non-empty user_properties
    filter, map_concat precedence with the truthy-gated pair table, JS
    identity coalesce, ip passthrough; reference
    transform/amplitudeToMixpanel.js:86-107) projected to scalars."""
    from tomixpanel_spark.transforms.amplitude import amp_profiles

    out = amp_profiles(_synth_amp(spark, sf_dir))
    return out.select(*_amp_profiles_columns())


@lru_cache(maxsize=1)
def _amp_profiles_columns() -> tuple:
    s = F.col("set")
    return (
        F.col("distinct_id"),
        F.col("ip"),
        F.element_at(s, "plan").alias("plan"),
        F.element_at(s, "tier").alias("tier"),
        F.element_at(s, "$os").alias("os"),
        F.element_at(s, "$region").alias("region"),
        F.element_at(s, "$city").alias("city"),
        F.element_at(s, "$app_version_string").alias("app_ver"),
        F.element_at(s, "$model").alias("model"),
    )


_AMP_PROFILES_SQL = """
WITH s AS (
  SELECT event_id AS e, user_id AS u FROM events WHERE event_id % 4 = 0)
SELECT
  COALESCE(CASE WHEN u % 3 = 0 THEN NULL ELSE 'user_' || CAST(u AS VARCHAR) END,
           CASE WHEN e % 10 = 9 THEN NULL ELSE 'dev_' || CAST(u % 50 AS VARCHAR) END,
           CAST(e AS VARCHAR)) AS distinct_id,
  CASE WHEN u % 5 = 0 THEN NULL ELSE '10.0.0.1' END AS ip,
  'user-plan' AS plan,
  'gold' AS tier,
  CASE WHEN u % 5 = 0 THEN NULL ELSE 'ios' END AS os,
  'ca' AS region,
  'sf' AS city,
  CASE WHEN u % 5 < 2 THEN NULL ELSE '1.2.3' END AS app_ver,
  'iphone' AS model
FROM s
"""


def ga_profiles_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 (GA side): real transforms.ga.ga_profiles over the synthesized
    nested sessions — one $set per session from the device/location/
    attribution pair tables, INCLUDING the lat/long hoist (both-present
    gate; reference transform/gaToMixpanel.js:101-127,119-122) — projected
    to scalars."""
    from tomixpanel_spark.transforms.ga import ga_profiles

    # same by-name resolution as ga_transform: the schema reorder-select
    # was a no-op projection costing an analyzer pass per build
    sessions = _synth_ga_sessions(spark, sf_dir)
    out = ga_profiles(sessions)
    return out.select(*_ga_profiles_columns())


@lru_cache(maxsize=1)
def _ga_profiles_columns() -> tuple:
    s = F.col("set")
    return (
        F.col("distinct_id"),
        F.element_at(s, "$os").alias("os"),
        F.element_at(s, "mp_country_code").alias("country_code"),
        F.element_at(s, "$city").alias("city"),
        F.element_at(s, "utm_keyword").alias("keyword"),
        F.element_at(s, "UTM Channel").alias("utm_channel"),
        F.element_at(s, "$latitude").alias("set_latitude"),
        F.col("latitude"),
        F.col("longitude"),
    )


_GA_PROFILES_SQL = """
WITH g AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events)
SELECT
  CASE WHEN u % 3 = 0 THEN 'fv' || CAST(u % 7 AS VARCHAR)
       ELSE 'gu' || CAST(u AS VARCHAR) END AS distinct_id,
  'Macintosh' AS os,
  CASE WHEN u % 4 <> 0 THEN 'United States' END AS country_code,
  'San Francisco' AS city,
  CASE WHEN u % 2 = 0 THEN 'shoes' END AS keyword,
  'Organic Search' AS utm_channel,
  CASE WHEN u % 3 = 0 THEN '37.77' END AS set_latitude,
  CASE WHEN u % 3 = 0 THEN '37.77' END AS latitude,
  CASE WHEN u % 3 = 0 THEN '-122.41' END AS longitude
FROM g
"""


def _synth_engage_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> /engage-result-page-shaped rows (T15 fixture): pages of
    {$distinct_id, $properties} structs grouped by a modular page key.
    Fixture synthesis — cached as a derived view like the other synths."""

    def build():
        ev = table(spark, sf_dir, "events")
        u = F.col("user_id")
        return (
            ev.select(
                F.pmod("event_id", F.lit(64)).alias("pg"),
                F.struct(
                    F.concat(F.lit("u"), u.cast("string")).alias("$distinct_id"),
                    F.create_map(
                        F.lit("plan"),
                        F.when(u % 2 == 0, F.lit("free")).otherwise(F.lit("pro")),
                        F.lit("$city"),
                        F.lit("sf"),
                    ).alias("$properties"),
                ).alias("r"),
            )
            .groupBy("pg")
            # collect_list order is task-nondeterministic, which is the
            # POINT: the explode under test must make page order and
            # in-page order irrelevant (row-multiset compare downstream)
            .agg(F.collect_list("r").alias("results"))
        )

    return derived(spark, ("synth_engage", sf_dir), build, kind="fixture")


def engage_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: real transforms.mixpanel.mp_engage_profiles over synthesized
    /engage result pages — the explode + $-field reshape (reference
    connectors/mixpanelEngageExport shape) projected to scalars. Page
    grouping is irrelevant after the explode, so the oracle is the flat
    per-event projection."""
    from tomixpanel_spark.transforms.mixpanel import mp_engage_profiles

    out = mp_engage_profiles(_synth_engage_pages(spark, sf_dir))
    s = F.col("set")
    return out.select(
        F.col("distinct_id"),
        F.element_at(s, "plan").alias("plan"),
        F.element_at(s, "$city").alias("city"),
        F.col("ignore_time"),
    )


_ENGAGE_RESHAPE_SQL = """
SELECT 'u' || CAST(user_id AS VARCHAR) AS distinct_id,
       CASE WHEN user_id % 2 = 0 THEN 'free' ELSE 'pro' END AS plan,
       'sf' AS city,
       TRUE AS ignore_time
FROM events
"""


def _synth_mp_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> /export-shaped rows {event, properties} (T16 fixture):
    reserved mp keys + two custom props, SQL-mirrorable modular rules."""

    def build():
        ev = table(spark, sf_dir, "events")
        u = F.col("user_id")
        e = F.col("event_id")
        return ev.select(
            F.col("event_type").alias("event"),
            F.create_map(
                F.lit("distinct_id"), F.concat(F.lit("u"), u.cast("string")),
                F.lit("$device_id"), F.concat(F.lit("d"), (u % 50).cast("string")),
                F.lit("time"), F.unix_seconds("ts").cast("string"),
                F.lit("$insert_id"), F.concat(F.lit("i"), e.cast("string")),
                F.lit("ip"), F.lit("10.0.0.9"),
                F.lit("plan"),
                F.when(u % 2 == 0, F.lit("free")).otherwise(F.lit("pro")),
                F.lit("step"), (e % 7).cast("string"),
            ).alias("properties"),
        )

    return derived(spark, ("synth_mp_export", sf_dir), build, kind="fixture")


def reverse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16: real transforms.mixpanel.mp_to_amplitude_events over
    synthesized /export rows — the reverse-ETL projection (reserved-key
    lift + sec->ms time + reserved-key strip from event_properties;
    reference connectors/mixpanelETL.js reverse path) projected to
    scalars. The map strip is checked BOTH ways: a custom key survives,
    a reserved key is absent."""
    from tomixpanel_spark.transforms.mixpanel import mp_to_amplitude_events

    out = mp_to_amplitude_events(_synth_mp_export(spark, sf_dir))
    return out.select(*_reverse_events_columns())


@lru_cache(maxsize=1)
def _reverse_events_columns() -> tuple:
    ep = F.col("event_properties")
    return (
        F.col("user_id"),
        F.col("device_id"),
        F.col("event_type"),
        F.col("time"),
        F.col("insert_id"),
        F.col("ip"),
        F.element_at(ep, "plan").alias("plan"),
        F.element_at(ep, "step").alias("step"),
        F.element_at(ep, "$insert_id").alias("stripped_reserved"),
        F.size(F.map_keys(ep)).alias("n_custom"),
    )


_REVERSE_EVENTS_SQL = """
SELECT 'u' || CAST(user_id AS VARCHAR) AS user_id,
       'd' || CAST(user_id % 50 AS VARCHAR) AS device_id,
       event_type,
       CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS time,
       'i' || CAST(event_id AS VARCHAR) AS insert_id,
       '10.0.0.9' AS ip,
       CASE WHEN user_id % 2 = 0 THEN 'free' ELSE 'pro' END AS plan,
       CAST(event_id % 7 AS VARCHAR) AS step,
       NULL AS stripped_reserved,
       2 AS n_custom
FROM events
"""


# Helper modules whose changes should count as a change to this
# module's registered queries for the external-window rotation
# (rule: code changed since last external green outranks staleness).
ROTATION_DEPS = [
    "tomixpanel_spark.transforms.amplitude",
    "tomixpanel_spark.transforms.ga",
    "tomixpanel_spark.transforms.mixpanel",
    "tomixpanel_spark.schemas",
]

REGISTRY = {
    "amp_transform": QuerySpec(amp_transform, _AMP_TRANSFORM_SQL, "T4+T5+T6+T8 e2e"),
    "custom_dims": QuerySpec(custom_dims, _CUSTOM_DIMS_SQL, "T12"),
    "ga_transform": QuerySpec(ga_transform, _GA_TRANSFORM_SQL, "M1+M2+T9+T5 e2e"),
    "amp_profiles": QuerySpec(
        amp_profiles_parity, _AMP_PROFILES_SQL, "T14 amp $set shaping"
    ),
    "ga_profiles": QuerySpec(
        ga_profiles_parity, _GA_PROFILES_SQL, "T14 GA $set + lat/long hoist"
    ),
    "engage_reshape": QuerySpec(
        engage_reshape, _ENGAGE_RESHAPE_SQL, "T15 /engage reshape"
    ),
    "reverse_events": QuerySpec(
        reverse_events, _REVERSE_EVENTS_SQL, "T16 reverse-ETL event projection"
    ),
}
