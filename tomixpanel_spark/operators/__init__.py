"""Operator/query registry: one entry per implemented operator from
SURVEY.md §2 plus the scale extensions (dedup / similarity / text /
multimodal)."""

from tomixpanel_spark.operators import (
    analytics,
    identity,
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    textops,
    transform_parity,
)
from tomixpanel_spark.operators.base import QuerySpec, collect_registry
from tomixpanel_spark.sources import csv as csv_source


def registry() -> dict[str, QuerySpec]:
    return collect_registry(
        relational,
        events,
        textops,
        dedup,
        similarity,
        multimodal,
        csv_source,
        analytics,
        transform_parity,
        identity,
    )


__all__ = ["registry", "QuerySpec"]
