"""Canonical schemas for the engine's record shapes.

The reference is schemaless JSON (SURVEY.md §1.2); the engine types the
core fields and overflows arbitrary vendor properties into
MAP<STRING,STRING> columns (SURVEY.md §1.3 mapping table).

Mixpanel canonical shapes (what every source transform produces):
  * event   — event, distinct_id, time_ms, insert_id, props map
  * profile — token, distinct_id, ip, set map ($set upsert semantics)
  * merge   — id_a, id_b identity edge (reference emits
    {event:"$merge", properties:{$distinct_ids:[a,b]}})

Source shapes are typed to the fields each transform actually reads
(FIXTURES.md F1-F4), with citations into the reference transform code.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

S = StringType()
MAP_SS = MapType(StringType(), StringType())


def _f(name, t, nullable=True):
    return StructField(name, t, nullable)


# ---------------------------------------------------------------- canonical
MP_EVENT_SCHEMA = StructType(
    [
        _f("event", S, False),
        _f("distinct_id", S),
        _f("time_ms", LongType()),
        _f("insert_id", S),
        _f("props", MAP_SS),
    ]
)

MP_PROFILE_SCHEMA = StructType(
    [
        _f("token", S),
        _f("distinct_id", S, False),
        _f("ip", S),
        _f("set", MAP_SS),
    ]
)

MP_MERGE_SCHEMA = StructType(
    [
        _f("id_a", S, False),
        _f("id_b", S, False),
        _f("insert_id", S),
        _f("time_ms", LongType()),
    ]
)

# ---------------------------------------------------------------- amplitude
# Fields consumed by the reference amplitude transform
# (reference transform/amplitudeToMixpanel.js:73-163; FIXTURES.md F1).
AMP_EVENT_SCHEMA = StructType(
    [
        _f("event_type", S),
        _f("user_id", S),
        _f("device_id", S),
        _f("amplitude_id", LongType()),
        _f("event_time", S),  # "YYYY-MM-DD HH:mm:ss.SSS" UTC
        _f("$insert_id", S),
        _f("ip_address", S),
        _f("city", S),
        _f("region", S),
        _f("country", S),
        _f("language", S),
        _f("app_version", S),
        _f("os_name", S),
        _f("os_version", S),
        _f("device_brand", S),
        _f("device_manufacturer", S),
        _f("device_model", S),
        _f("event_properties", MAP_SS),
        _f("user_properties", MAP_SS),
        _f("groups", MAP_SS),
        # consumed-and-deleted by the reference (:142-146); kept so reads
        # don't fail, dropped by the transform:
        _f("group_properties", MAP_SS),
        _f("global_user_properties", MAP_SS),
        _f("data", MAP_SS),
    ]
)

# ---------------------------------------------------------------- GA360
# Typed to the fields gaToMixpanel.js reads (reference transform/
# gaToMixpanel.js:101-386 + gaSchema.json field inventory; FIXTURES.md F2).
# GA exports encode nearly everything as strings.
_GA_TOTALS = StructType(
    [
        _f("visits", S),
        _f("hits", S),
        _f("pageviews", S),
        _f("timeOnSite", S),
        _f("newVisits", S),  # unconsumed pass-through (gaSchema.json totals)
    ]
)
_GA_TRAFFIC = StructType(
    [
        _f("campaign", S),
        _f("source", S),
        _f("medium", S),
        _f("keyword", S),
        _f("adContent", S),
        _f("campaignCode", S),
        _f("referralPath", S),
        _f("isTrueDirect", BooleanType()),
        _f("adwordsClickInfo", StructType([_f("criteriaParameters", S)])),
    ]
)
_GA_DEVICE = StructType(
    [
        _f("browser", S),
        _f("browserSize", S),
        _f("browserVersion", S),
        _f("deviceCategory", S),
        _f("mobileDeviceInfo", S),
        _f("mobileDeviceModel", S),
        _f("operatingSystem", S),
        _f("operatingSystemVersion", S),
        _f("mobileDeviceBranding", S),
        _f("language", S),
        _f("screenResolution", S),
        _f("isMobile", BooleanType()),
        # unconsumed pass-throughs (gaSchema.json device inventory):
        # validated-then-ignored rather than dropped at read time
        _f("flashVersion", S),
        _f("mobileDeviceMarketingName", S),
        _f("mobileInputSelector", S),
        _f("screenColors", S),
    ]
)
_GA_GEO = StructType(
    [
        _f("continent", S),
        _f("subContinent", S),
        _f("country", S),
        _f("region", S),
        _f("metro", S),
        _f("city", S),
        _f("latitude", S),
        _f("longitude", S),
        # unconsumed pass-throughs (gaSchema.json geoNetwork inventory)
        _f("cityId", S),
        _f("networkDomain", S),
        _f("networkLocation", S),
    ]
)
_GA_IDX_VAL = StructType([_f("index", S), _f("value", S)])
_GA_PAGE = StructType(
    [
        _f("pagePath", S),
        _f("hostname", S),
        _f("pageTitle", S),
        # unconsumed pass-throughs (gaSchema.json hits.page inventory)
        _f("pagePathLevel1", S),
        _f("pagePathLevel2", S),
        _f("pagePathLevel3", S),
        _f("pagePathLevel4", S),
    ]
)
_GA_EVENT_INFO = StructType(
    [_f("eventCategory", S), _f("eventAction", S), _f("eventLabel", S)]
)
# Unconsumed hit sub-records from the gaSchema.json inventory, typed so a
# real export reads (and validates) rather than silently dropping them.
_GA_APP_INFO = StructType(
    [
        _f("screenName", S),
        _f("landingScreenName", S),
        _f("exitScreenName", S),
        _f("screenDepth", S),
    ]
)
_GA_CONTENT_GROUP = StructType(
    [_f(f"contentGroup{i}", S) for i in range(1, 6)]
    + [_f(f"previousContentGroup{i}", S) for i in range(1, 6)]
)
_GA_ECOMMERCE_ACTION = StructType([_f("action_type", S), _f("step", S)])
_GA_EXCEPTION_INFO = StructType([_f("isFatal", BooleanType())])
_GA_HIT = StructType(
    [
        _f("hitNumber", S),
        _f("time", S),  # ms offset from visitStartTime; first hit "0"
        _f("hour", S),
        _f("minute", S),
        _f("isInteraction", BooleanType()),
        _f("isEntrance", BooleanType()),
        _f("isExit", BooleanType()),
        _f("referer", S),
        _f("type", S),
        _f("page", _GA_PAGE),
        _f("eventInfo", _GA_EVENT_INFO),
        # product/promotion/experiment/publisher_infos are untyped arrays
        # in gaSchema.json; transaction/social carry loose key sets — all
        # overflow as MAP<STRING,STRING> per the §1.3 typed-overflow model,
        # preserving the reference's JS-spread semantics.
        _f("product", ArrayType(MAP_SS)),
        _f("promotion", ArrayType(MAP_SS)),
        _f("transaction", MAP_SS),
        _f("social", MAP_SS),
        _f("customDimensions", ArrayType(_GA_IDX_VAL)),
        _f("customMetrics", ArrayType(_GA_IDX_VAL)),
        _f("customVariables", ArrayType(_GA_IDX_VAL)),
        # unconsumed pass-throughs (gaSchema.json hit inventory)
        _f("appInfo", _GA_APP_INFO),
        _f("contentGroup", _GA_CONTENT_GROUP),
        _f("eCommerceAction", _GA_ECOMMERCE_ACTION),
        _f("exceptionInfo", _GA_EXCEPTION_INFO),
        _f("experiment", ArrayType(MAP_SS)),
        _f("publisher_infos", ArrayType(MAP_SS)),
    ]
)
GA_SESSION_SCHEMA = StructType(
    [
        _f("visitNumber", S),
        _f("visitId", S),
        _f("visitStartTime", S),  # epoch seconds as string
        _f("date", S),
        _f("fullVisitorId", S),
        _f("userId", S),
        _f("visitorId", S),
        _f("client_id", S),
        _f("channelGrouping", S),
        _f("socialEngagementType", S),
        _f("totals", _GA_TOTALS),
        _f("trafficSource", _GA_TRAFFIC),
        _f("device", _GA_DEVICE),
        _f("geoNetwork", _GA_GEO),
        _f("customDimensions", ArrayType(_GA_IDX_VAL)),
        _f("hits", ArrayType(_GA_HIT)),
    ]
)

# ---------------------------------------------------------------- mixpanel
# /export NDJSON event (FIXTURES.md F4): {event, properties:{...}}
MP_EXPORT_SCHEMA = StructType(
    [_f("event", S), _f("properties", MAP_SS)]
)

# /engage page: {page, page_size, session_id, results:[{$distinct_id, $properties}]}
MP_ENGAGE_PAGE_SCHEMA = StructType(
    [
        _f("page", LongType()),
        _f("page_size", LongType()),
        _f("session_id", S),
        _f("total", LongType()),
        _f(
            "results",
            ArrayType(
                StructType([_f("$distinct_id", S), _f("$properties", MAP_SS)])
            ),
        ),
    ]
)
