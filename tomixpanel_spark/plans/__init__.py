"""Physical-plan auditing (the explain()-and-iterate loop, made testable)."""

from tomixpanel_spark.plans.audit import (
    exchange_count,
    formatted_plan,
    join_strategies,
    pushed_filters,
    read_schemas,
    scan_columns,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "join_strategies",
    "exchange_count",
    "scan_columns",
]
