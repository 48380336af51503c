"""Event-pipeline operators (SURVEY.md §2.3 T3-T10, §2.4 M2/M4-M8, §2.5 V1).

These are the reference's core per-record transforms re-expressed as
Catalyst column expressions over the synthetic ``events`` table. Every one
is a narrow projection/filter or a single hash-aggregate — no Python in the
data path, all inside whole-stage codegen.

The synthesized null/corruption patterns (``user_id % 3 = 0 -> NULL`` etc.)
stand in for the reference's nullable source fields (FIXTURES.md F1 null%
columns) so the coalesce/skip branches are actually exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tomixpanel_spark.functions.canonical import normalize_time_ms
from tomixpanel_spark.operators.base import QuerySpec, table

_PROPS_SCHEMA = "map<string,string>"


def _nullable_user(col="user_id"):
    """FIXTURES F1: user_id null ~30% — synthesized deterministically."""
    return F.when(F.col(col) % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.col(col).cast("string")
    )


def _device_id():
    """Synthetic device_id shared across a user's events (50 devices)."""
    return F.concat(F.lit("device:"), (F.col("user_id") % 50).cast("string"))


def filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: keep only rows with a non-empty property bag (reference
    transform/amplitudeToMixpanel.js:86-88 derives profiles only from events
    with non-empty user_properties). Empty bags synthesized for event_id%5=0."""
    ev = table(spark, sf_dir, "events")
    bag = F.when(F.col("event_id") % 5 == 0, F.lit("{}")).otherwise(F.col("props"))
    props = F.from_json(bag, _PROPS_SCHEMA)
    return (
        ev.withColumn("user_properties", props)
        .filter(F.size(F.map_keys(F.col("user_properties"))) > 0)
        .select("event_id", "user_id", "event_type")
    )


_FILTER_NONEMPTY_SQL = """
SELECT event_id, user_id, event_type
FROM events
WHERE (CASE WHEN event_id % 5 = 0 THEN '{}' ELSE props END) <> '{}'
"""


def coalesce_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: identity coalesce user_id || device_id || '' (reference
    transform/amplitudeToMixpanel.js:93,124 and gaToMixpanel.js:111,135)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(_nullable_user(), _device_id(), F.lit("")).alias("distinct_id"),
    )


_COALESCE_ID_SQL = """
SELECT event_id,
  COALESCE(CASE WHEN user_id % 3 = 0 THEN NULL ELSE CAST(user_id AS VARCHAR) END,
           'device:' || CAST(user_id % 50 AS VARCHAR), '') AS distinct_id
FROM events
"""


def map_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: property-bag merge with JS-spread precedence, later wins
    (reference transform/amplitudeToMixpanel.js:138 `{...event_properties,
    ...groups, ...user_properties, ...reserved}`). Requires session conf
    mapKeyDedupPolicy=LAST_WIN; defaults map first, source props last."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    ev = table(spark, sf_dir, "events")
    defaults = F.create_map(
        F.lit("k"), F.lit("default"), F.lit("$source"), F.lit("tomixpanel_spark")
    )
    merged = F.map_concat(defaults, F.from_json("props", _PROPS_SCHEMA))
    return ev.select(
        "event_id",
        F.element_at(merged, "k").alias("k"),
        F.element_at(merged, "$source").alias("source"),
    )


_MAP_MERGE_SQL = """
SELECT event_id,
  COALESCE(json_extract_string(props, '$.k'), 'default') AS k,
  'tomixpanel_spark' AS source
FROM events
"""


def time_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: epoch-seconds / epoch-ms / datetime-string heuristic (reference
    connectors/csvETL.js:80-90: >=13 digits => ms, digits => s, else parse).
    Raw strings synthesized from ts in all three formats by event_id % 3."""
    ev = table(spark, sf_dir, "events")
    sec = F.unix_seconds(F.col("ts"))
    raw = (
        F.when(F.col("event_id") % 3 == 0, sec.cast("string"))
        .when(F.col("event_id") % 3 == 1, (sec * 1000).cast("string"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    return ev.select("event_id", normalize_time_ms(raw).alias("time_ms"))


_TIME_NORMALIZE_SQL = """
WITH r AS (
  SELECT event_id,
    CASE CAST(event_id % 3 AS INTEGER)
      WHEN 0 THEN CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR)
      WHEN 1 THEN CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS VARCHAR)
      ELSE strftime(ts, '%Y-%m-%d %H:%M:%S')
    END AS raw
  FROM events)
SELECT event_id,
  CASE
    WHEN regexp_matches(raw, '^[0-9]+$') AND length(raw) >= 13 THEN CAST(raw AS BIGINT)
    WHEN regexp_matches(raw, '^[0-9]+$') THEN CAST(raw AS BIGINT) * 1000
    ELSE epoch_ms(CAST(raw AS TIMESTAMP))
  END AS time_ms
FROM r
"""


def insert_id_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: deterministic surrogate $insert_id = md5(canonical record)
    (reference transform/amplitudeToMixpanel.js:159-163; canonical form is
    ours — pinned field order, '|' joined — since JS key order isn't
    reproducible). Idempotency anchor for sink retries."""
    from tomixpanel_spark.functions.canonical import canonical_insert_id

    ev = table(spark, sf_dir, "events")
    ins = canonical_insert_id(
        F.col("event_type"),
        F.col("user_id"),
        F.unix_millis("ts"),
        F.col("event_id"),
    )
    return ev.select("event_id", ins.alias("insert_id"))


_INSERT_ID_MD5_SQL = """
SELECT event_id,
  md5(event_type || '|' || CAST(user_id AS VARCHAR) || '|' ||
      CAST(epoch_ms(ts) AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)) AS insert_id
FROM events
"""


def when_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: conditional event naming, eventAction -> eventCategory -> hit.type
    with 'na'/empty guards (reference transform/gaToMixpanel.js:181-195)."""
    ev = table(spark, sf_dir, "events")
    et = F.lower(F.col("event_type"))
    name = (
        F.when(et.isNull() | (et == "") | (et == "na"), F.lit("unknown event"))
        .when(et == "click", F.lit("Click"))
        .when(et == "view", F.lit("Page View"))
        .when(et == "purchase", F.lit("Purchase"))
        .when(et == "signup", F.lit("Sign Up"))
        .otherwise(F.concat(F.lit("event: "), et))
    )
    return ev.select("event_id", name.alias("display_name"))


_WHEN_CHAIN_SQL = """
SELECT event_id,
  CASE
    WHEN lower(event_type) IS NULL OR lower(event_type) IN ('', 'na') THEN 'unknown event'
    WHEN lower(event_type) = 'click' THEN 'Click'
    WHEN lower(event_type) = 'view' THEN 'Page View'
    WHEN lower(event_type) = 'purchase' THEN 'Purchase'
    WHEN lower(event_type) = 'signup' THEN 'Sign Up'
    ELSE 'event: ' || lower(event_type)
  END AS display_name
FROM events
"""


def session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: per-group session boundary synthesis — begins at first event,
    ends at last event + 1s (reference transform/gaToMixpanel.js:136-154,
    266-280; expressed as group max/min instead of the reference's running
    variable, so it's a single partial-aggregable shuffle)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.unix_millis(F.min("ts")).alias("session_begin_ms"),
        (F.unix_millis(F.max("ts")) + 1000).alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_hits"),
    )


_SESSION_BOUNDS_SQL = """
SELECT user_id, epoch_ms(min(ts)) AS session_begin_ms,
       epoch_ms(max(ts)) + 1000 AS session_end_ms,
       COUNT(*) AS n_hits
FROM events GROUP BY user_id
"""


def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: keep-FIRST dedup by key in ordinal order (reference
    connectors/csvETL.js:150 findIndex first-occurrence; uniqBy at
    transform/amplitudeToMixpanel.js:271). Exact keep-first semantics via
    row_number over (key, ordinal) — one shuffle on the key."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


_DEDUP_BY_KEY_SQL = """
SELECT user_id, event_type, event_id
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
"""


def merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: identity-pair extraction — events carrying both a user id and a
    device id yield a distinct $merge edge (reference
    transform/amplitudeToMixpanel.js:173-219, deduped :271)."""
    ev = table(spark, sf_dir, "events")
    user = _nullable_user()
    dev = _device_id()
    return (
        ev.select(user.alias("id_a"), dev.alias("id_b"))
        .filter(F.col("id_a").isNotNull() & F.col("id_b").isNotNull())
        .distinct()
    )


_MERGE_PAIRS_SQL = """
SELECT DISTINCT CAST(user_id AS VARCHAR) AS id_a,
       'device:' || CAST(user_id % 50 AS VARCHAR) AS id_b
FROM events
WHERE user_id % 3 <> 0
"""


def time_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: global time-shift to present — offset anchors on the TRUE max
    event time minus 4 days (reference transform/gaToMixpanel.js:290-298
    anchors on the last array element; SURVEY flags that as a bug we fix).
    Fixed anchor timestamp keeps the query deterministic for the oracle."""
    ev = table(spark, sf_dir, "events")
    anchor_ms = 1767225600000  # 2026-01-01T00:00:00Z
    four_days_ms = 4 * 86400 * 1000
    mx = ev.agg(F.unix_millis(F.max("ts")).alias("max_ms"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_id",
            (F.unix_millis("ts") + F.lit(anchor_ms) - F.col("max_ms") - F.lit(four_days_ms)).alias(
                "shifted_ms"
            ),
        )
    )


_TIME_SHIFT_SQL = """
SELECT event_id,
  epoch_ms(ts) + 1767225600000 - m.max_ms - 345600000 AS shifted_ms
FROM events CROSS JOIN (SELECT max(epoch_ms(ts)) AS max_ms FROM events) m
"""


def count_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: summary counting — events per type, value totals, distinct users
    (reference transform/amplitudeToMixpanel.js:33-35,299 running totals;
    here one hash aggregate with map-side partials)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


_COUNT_AGG_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def schema_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1/V2: schema validation gate — corrupt records are flagged, not
    crashed on (reference transform/gaToMixpanel.js:51-57 skips nonconforming
    files; transform/amplitudeToMixpanel.js:58-67 skips bad lines). Corruption
    synthesized by truncating props for event_id % 10 = 0."""
    ev = table(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 10 == 0, F.substring("props", 1, 3)).otherwise(
        F.col("props")
    )
    parsed = F.from_json(raw, _PROPS_SCHEMA)
    return ev.select("event_id", parsed.isNotNull().alias("is_valid"))


_SCHEMA_GATE_SQL = """
SELECT event_id,
  json_valid(CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3) ELSE props END) AS is_valid
FROM events
"""


# Helper modules whose changes should count as a change to this
# module's registered queries for the external-window rotation
# (rule: code changed since last external green outranks staleness).
ROTATION_DEPS = [
    "tomixpanel_spark.functions.canonical",
]

REGISTRY = {
    "filter_nonempty": QuerySpec(filter_nonempty, _FILTER_NONEMPTY_SQL, "T3"),
    "coalesce_id": QuerySpec(coalesce_id, _COALESCE_ID_SQL, "T4"),
    "map_merge": QuerySpec(map_merge, _MAP_MERGE_SQL, "T6"),
    "time_normalize": QuerySpec(time_normalize, _TIME_NORMALIZE_SQL, "T7"),
    "insert_id_md5": QuerySpec(insert_id_md5, _INSERT_ID_MD5_SQL, "T8"),
    "when_chain": QuerySpec(when_chain, _WHEN_CHAIN_SQL, "T9"),
    "session_bounds": QuerySpec(session_bounds, _SESSION_BOUNDS_SQL, "M2"),
    "dedup_by_key": QuerySpec(dedup_by_key, _DEDUP_BY_KEY_SQL, "M4"),
    "merge_pairs": QuerySpec(merge_pairs, _MERGE_PAIRS_SQL, "M5"),
    "time_shift": QuerySpec(time_shift, _TIME_SHIFT_SQL, "M6"),
    "count_agg": QuerySpec(count_agg, _COUNT_AGG_SQL, "M8"),
    "schema_gate": QuerySpec(schema_gate, _SCHEMA_GATE_SQL, "V1+V2"),
}
