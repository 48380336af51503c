"""Canonical serialization + time normalization (reference-parity scalars).

Reference behaviors re-expressed as Catalyst column expressions:

  * deterministic surrogate key ``$insert_id = md5(canonical record)`` —
    reference computes ``md5(JSON.stringify(record))`` only when the source
    didn't ship one (reference transform/amplitudeToMixpanel.js:159-163,
    transform/gaToMixpanel.js:283-287, connectors/csvETL.js:111-118).
    JS object-key insertion order is not reproducible across engines, so the
    engine pins its own canonical form: ``md5(concat_ws('|', fields...))``
    with the field order fixed by the caller. Deterministic => idempotent
    re-sends at the sink (task retries don't double-import).

  * time normalization heuristic — reference connectors/csvETL.js:80-90:
    numeric with >= 13 digits => epoch milliseconds, other numeric => epoch
    seconds, non-numeric => parse as UTC datetime string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 10^13 ms ~ year 2286; anything >= 13 digits is ms (reference csvETL.js:84).
_MS_DIGITS = 13


def canonical_insert_id(*fields: Column | str) -> Column:
    """md5 over a pinned-order, '|'-joined field list (null -> empty string).

    ``concat_ws`` skips nulls entirely, which would make ("a", None, "b")
    collide with ("a", "b", None); coalesce each field to '' first so arity
    is preserved.
    """
    cols = [F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit("")) for c in fields]
    return F.md5(F.concat_ws("|", *cols))


def normalize_time_ms(raw: Column | str) -> Column:
    """Raw string/number -> epoch milliseconds (BIGINT), reference heuristic.

    - all-digit string of >= 13 chars: already ms
    - all-digit string of < 13 chars: epoch seconds -> * 1000
    - otherwise: UTC datetime string -> parsed (sub-second precision kept)
    """
    c = F.col(raw) if isinstance(raw, str) else raw
    s = F.trim(c.cast("string"))
    is_num = s.rlike(r"^\d+$")
    return (
        F.when(is_num & (F.length(s) >= _MS_DIGITS), s.cast("bigint"))
        .when(is_num, s.cast("bigint") * 1000)
        .otherwise(F.unix_millis(F.to_timestamp(s)))
        .alias("time_ms")
    )


def normalize_time_ts(raw: Column | str) -> Column:
    """Same heuristic, but producing a session-TZ TIMESTAMP column."""
    return F.timestamp_millis(normalize_time_ms(raw))
