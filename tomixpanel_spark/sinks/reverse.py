"""Reverse-ETL sinks: Mixpanel -> Amplitude / Woopra (SURVEY.md §2.2 K7/K8).

Reference behaviors (load/sendOther.js):
  * Amplitude HTTP API v2: 2,000-event / 1,000-user chunks (:209,237),
    2 s sleep between batches as the vendor rate-limit workaround
    (:110,223,261-264 — "HACK!"). The engine replaces the sleep with
    per-partition fixed-interval pacing (min_interval_s), which holds the
    same global rate with N partitions at interval N*2s, and keeps retries
    + receipts.
  * Woopra: NDJSON body, 10,000-record chunks (:97).

These are thin profiles over sinks.http.HttpSink — same receipts, retries,
dead-letters; only the wire shape, chunk sizes, and pacing differ.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame

from tomixpanel_spark.sinks.http import HttpSink, HttpSinkConfig, Transport

AMPLITUDE_HTTP_API = "https://api2.amplitude.com/2/httpapi"
AMPLITUDE_IDENTIFY_API = "https://api2.amplitude.com/identify"
WOOPRA_IMPORT_URL = "https://www.woopra.com/rest/3.0/logs/import"
AMP_EVENTS_PER_BATCH = 2000
AMP_USERS_PER_BATCH = 1000
WOOPRA_PER_BATCH = 10000
VENDOR_PACING_S = 2.0


def amplitude_event_record(rec: dict) -> dict:
    """Row from transforms.mixpanel.mp_to_amplitude_events -> wire dict."""
    return {
        "user_id": rec.get("user_id"),
        "device_id": rec.get("device_id"),
        "event_type": rec.get("event_type"),
        "time": rec.get("time"),
        "insert_id": rec.get("insert_id"),
        "ip": rec.get("ip"),
        "event_properties": dict(rec.get("event_properties") or {}),
    }


def amplitude_user_record(rec: dict) -> dict:
    return {
        "user_id": rec.get("user_id"),
        "user_properties": dict(rec.get("user_properties") or {}),
    }


def woopra_record(rec: dict) -> dict:
    return {
        "project": rec.get("project"),
        "visitor": dict(rec.get("visitor") or {}),
        "actions": [
            {
                "name": a.get("name"),
                "timestamp": a.get("timestamp"),
                "properties": dict(a.get("properties") or {}),
            }
            for a in (rec.get("actions") or [])
        ],
    }


def amplitude_events_sink(
    api_key: str,
    url: str = AMPLITUDE_HTTP_API,
    transport: Optional[Transport] = None,
    pacing_s: float = VENDOR_PACING_S,
) -> HttpSink:
    """Amplitude HTTP API v2 requires the {"api_key", "events": [...]}
    envelope (reference load/sendOther.js sets options.data.api_key and
    data.events = chunk) — built per batch by the envelope hook."""

    def envelope(batch: list) -> bytes:
        return (
            b'{"api_key":"' + api_key.encode() + b'","events":['
            + b",".join(batch)
            + b"]}"
        )

    cfg = HttpSinkConfig(
        url=url,
        envelope=envelope,
        headers={"Content-Type": "application/json"},
        max_records=AMP_EVENTS_PER_BATCH,
        gzip=False,  # Amplitude HTTP API v2 takes plain JSON
        strict=False,
        min_interval_s=pacing_s,
    )
    return HttpSink(cfg, amplitude_event_record, transport)


def amplitude_users_sink(
    api_key: str,
    url: str = AMPLITUDE_IDENTIFY_API,
    transport: Optional[Transport] = None,
    pacing_s: float = VENDOR_PACING_S,
) -> HttpSink:
    """Amplitude /identify takes form-encoded api_key + identification
    (a JSON array) — reference load/sendOther.js /identify call shape."""

    def envelope(batch: list) -> bytes:
        import urllib.parse

        ident = b"[" + b",".join(batch) + b"]"
        return urllib.parse.urlencode(
            {"api_key": api_key, "identification": ident.decode("utf-8")}
        ).encode("utf-8")

    cfg = HttpSinkConfig(
        url=url,
        envelope=envelope,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        max_records=AMP_USERS_PER_BATCH,
        gzip=False,
        strict=False,
        min_interval_s=pacing_s,
    )
    return HttpSink(cfg, amplitude_user_record, transport)


def woopra_sink(
    project: str,
    url: str = WOOPRA_IMPORT_URL,
    transport: Optional[Transport] = None,
    username: str = "",
    password: str = "",
) -> HttpSink:
    """Woopra bulk import: NDJSON body over authenticated PUT with the
    project in the query string (reference load/sendOther.js woopraFlush:
    chunk.map(JSON.stringify).join('\n'), method PUT, basic auth)."""
    import base64
    import urllib.parse

    def envelope(batch: list) -> bytes:
        return b"\n".join(batch)

    q = urllib.parse.urlencode({"project": project})
    full_url = f"{url}{'&' if '?' in url else '?'}{q}"
    headers = {"Content-Type": "application/x-ndjson"}
    if username or password:
        tok = base64.b64encode(f"{username}:{password}".encode()).decode()
        headers["Authorization"] = f"Basic {tok}"
    cfg = HttpSinkConfig(
        url=full_url,
        method="PUT",
        envelope=envelope,
        headers=headers,
        max_records=WOOPRA_PER_BATCH,
        gzip=False,
        strict=False,
    )
    return HttpSink(cfg, woopra_record, transport)


def send_reverse_amplitude(
    events: DataFrame,
    users: DataFrame,
    api_key: str,
    transport: Optional[Transport] = None,
    concurrency: Optional[int] = None,
) -> dict:
    """Events then users, mirroring the reference's send order
    (load/sendOther.js:144-258). Returns receipt summaries."""
    from tomixpanel_spark.sinks.http import summarize_receipts

    ev_sink = amplitude_events_sink(api_key, transport=transport)
    us_sink = amplitude_users_sink(api_key, transport=transport)
    return {
        "events": summarize_receipts(ev_sink.send(events, concurrency)),
        "users": summarize_receipts(us_sink.send(users, concurrency)),
    }
