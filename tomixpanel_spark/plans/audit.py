"""Physical-plan auditing: assert the plan you'd want at 100 TB, not just
the one that passed.

Used by tests (tests/test_plans.py) and for ARCHITECTURE.md evidence: a
query whose scan stops pushing filters down or whose dim join stops
broadcasting is a performance regression even while results stay correct —
these helpers make that a failing assertion instead of a silent slowdown.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def join_strategies(df: DataFrame) -> list[str]:
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)",
        formatted_plan(df),
    )


def exchange_count(df: DataFrame) -> int:
    return len(re.findall(r"\bExchange\b", formatted_plan(df)))


def scan_columns(df: DataFrame, table_hint: str | None = None) -> set[str]:
    """Columns actually read from the (first matching) parquet scan."""
    out: set[str] = set()
    for schema in read_schemas(df):
        for part in schema.split(","):
            out.add(part.split(":")[0])
        break
    return out
