"""Event-time windowed aggregation with watermark (late-data handling).

The reference simply imports late events — Mixpanel accepts historical
data (SURVEY.md §2.6) — but a streaming deployment of this engine needs
real late-data semantics: tumbling event-time windows, a watermark
bounding state, and append-mode emission of finalized windows.

Scale shape: windowed aggregation state is keyed by (window, key); the
watermark lets Spark evict finalized windows, keeping state O(active
windows), and partial aggregation applies within each micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    time_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with a late-data watermark.

    Works on a streaming DataFrame (append mode emits each window once the
    watermark passes it — events later than ``watermark_delay`` are
    dropped) and on a batch DataFrame (same logical result, no state).
    """
    return (
        events.withWatermark(time_col, watermark_delay)
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
