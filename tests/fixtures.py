"""Deterministic synthetic vendor-shaped fixtures (FIXTURES.md F1-F4).

Null/absence patterns follow the fixture contract (F1 null% column) via
modular arithmetic on the row index — the transforms' coalesce/skip logic
branches on them.
"""

from __future__ import annotations

import json


def amp_event_rows(n: int = 40) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_type": ["login", "checkout", "page view"][i % 3],
                "user_id": None if i % 10 < 3 else f"user_{i % 7}",
                "device_id": None if i % 10 == 9 else f"dev_{i % 5}",
                "amplitude_id": 1000 + i,
                "event_time": f"2021-06-0{(i % 9) + 1} 12:{i % 60:02d}:00.000",
                "$insert_id": f"src-insert-{i}" if i % 2 == 0 else None,
                "ip_address": None if i % 5 == 0 else f"10.0.0.{i % 255}",
                "city": None if i % 5 == 0 else "sf",
                "region": None if i % 5 == 0 else "ca",
                "country": None if i % 5 == 0 else "us",
                "language": "en",
                "app_version": None if i % 5 < 2 else "1.2.3",
                "os_name": None if i % 5 == 0 else "ios",
                "os_version": "14.1",
                "device_brand": "apple",
                "device_manufacturer": "apple",
                "device_model": "iphone",
                "event_properties": {"plan": ["free", "pro"][i % 2]},
                "user_properties": {} if i % 5 < 3 else {"tier": "gold", "plan": "user-plan"},
                "groups": {} if i % 7 else {"org": f"org_{i % 3}"},
            }
        )
    return rows


def ga_session_rows(n: int = 12) -> list[dict]:
    rows = []
    for i in range(n):
        hits = []
        for h in range(1 + i % 3):
            hits.append(
                {
                    "hitNumber": str(h + 1),
                    "time": str(0 if h == 0 else h * 1500),
                    "hour": "12",
                    "minute": str(h),
                    "isInteraction": True,
                    "isEntrance": h == 0,
                    "isExit": h == i % 3,
                    "referer": f"https://ref{i}.example.com" if h == 0 else None,
                    "type": "PAGE",
                    "page": {
                        "pagePath": f"/p/{h}",
                        "hostname": "shop.example.com",
                        "pageTitle": f"Page {h}",
                    },
                    "eventInfo": None
                    if h == 0
                    else {
                        "eventCategory": "ecommerce",
                        "eventAction": ["na", "", "add to cart"][h % 3],
                        "eventLabel": "x",
                    },
                    "customDimensions": [
                        {"index": "1", "value": ["na", "red", ""][h % 3]},
                        {"index": "4", "value": "blue"},
                    ],
                }
            )
        rows.append(
            {
                "visitNumber": str(i + 1),
                "visitId": f"visit_{i}",
                "visitStartTime": str(1_600_000_000 + i * 3600),
                "date": "20200913",
                "fullVisitorId": f"fv_{i % 4}",
                "userId": None if i % 3 else f"ga_user_{i}",
                "visitorId": None,
                "client_id": None if i % 4 else f"client_{i}",
                "channelGrouping": "Organic Search",
                "socialEngagementType": "Not Socially Engaged",
                "totals": {"visits": "1", "hits": str(len(hits)), "pageviews": "1", "timeOnSite": "60"},
                "trafficSource": {
                    "campaign": "(not set)",
                    "source": "google",
                    "medium": "organic",
                    "keyword": None if i % 2 else "shoes",
                    "isTrueDirect": i % 5 == 0,
                    "adwordsClickInfo": {"criteriaParameters": "not available"},
                },
                "device": {
                    "browser": "Chrome",
                    "browserSize": "1920x1080",
                    "browserVersion": "85",
                    "deviceCategory": "desktop",
                    "mobileDeviceInfo": None,
                    "mobileDeviceModel": None,
                    "operatingSystem": "Macintosh",
                    "operatingSystemVersion": "10.15",
                    "mobileDeviceBranding": None,
                    "language": "en-us",
                    "screenResolution": "1920x1080",
                    "isMobile": False,
                },
                "geoNetwork": {
                    "continent": "Americas",
                    "subContinent": "Northern America",
                    "country": "United States",
                    "region": "California",
                    "metro": "San Francisco",
                    "city": "San Francisco",
                    "latitude": None if i % 3 else "37.77",
                    "longitude": None if i % 3 else "-122.41",
                },
                "customDimensions": [{"index": "2", "value": f"seg_{i % 2}"}],
                "hits": hits,
            }
        )
    return rows


def csv_text(n: int = 20, with_insert_id: bool = True) -> str:
    cols = ["action", "guid", "time", "favoriteColor", "plan", "amount"]
    if with_insert_id:
        cols.insert(3, "insert_id")
    lines = [",".join(cols)]
    for i in range(n):
        t = [
            str(1_600_000_000 + i),            # epoch seconds
            str((1_600_000_000 + i) * 1000),   # epoch ms (>=13 digits)
            f"2020-09-13 12:{i % 60:02d}:20",  # datetime string
        ][i % 3]
        row = [
            ["click", "buy"][i % 2],
            f"guid_{i % 6}",
            t,
            "red",
            ["free", "pro"][i % 2],
            str(i * 10),
        ]
        if with_insert_id:
            row.insert(3, f"csv-ins-{i}" if i % 2 == 0 else "")
        lines.append(",".join(row))
    return "\n".join(lines) + "\n"


def mp_export_lines(n: int = 15) -> str:
    out = []
    for i in range(n):
        out.append(
            json.dumps(
                {
                    "event": ["app open", "song play"][i % 2],
                    "properties": {
                        "distinct_id": f"mp_user_{i % 4}",
                        "time": 1_600_000_000 + i,
                        "$insert_id": f"mp-ins-{i}",
                        "$device_id": f"dev_{i % 3}",
                        "ip": f"10.1.1.{i}",
                        "genre": "jazz",
                        "$source": "test",
                    },
                }
            )
        )
    return "\n".join(out) + "\n"


def mp_engage_page(page: int, page_size: int, n_results: int) -> dict:
    return {
        "page": page,
        "page_size": page_size,
        "session_id": "sess-1",
        "total": 25,
        "results": [
            {
                "$distinct_id": f"mp_user_{page}_{i}",
                "$properties": {"$name": f"u{page}-{i}", "plan": "pro"},
            }
            for i in range(n_results)
        ],
    }
