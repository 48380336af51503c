"""Streaming deduplication for a continuously-landing document corpus.

A training-data pipeline ingests raw documents as they arrive; waiting for
a full batch re-crawl to dedup wastes storage and training tokens. Two
streaming-native pieces, both reusing the BATCH operators' expressions so
the semantics are identical on either path:

  * ``streaming_exact_dedup`` — keep the first document per canonical
    fingerprint (the streaming form of ``operators.dedup.dedup_exact``'s
    content identity). With an event-time column the state store is
    TTL-bounded via ``dropDuplicatesWithinWatermark`` — at corpus scale
    the fingerprint state would otherwise grow without bound; the
    watermark horizon is the documented recall trade (a dup arriving
    after the horizon re-emits, exactly like the batch job it feeds
    downstream would catch).
  * ``streaming_minhash_signatures`` — the per-doc MinHash signature as a
    STATELESS narrow projection (shingle arrays + 8 min-of-md5 folds are
    pure column expressions; no shuffle, no state). Signatures stream
    straight into the lake as the canonical materialized artifact, and the
    batch LSH banding (``lsh_pairs_from_signatures``) runs over the
    accumulated table — the standard lambda split for near-dup at scale:
    signatures online, pair generation offline.

Reference parity: the reference has no streaming dedup (its dedup is M4
keep-first per batch, connectors/*.js); these lift the same keep-first
semantics onto Structured Streaming.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tomixpanel_spark.functions.text import fingerprint
from tomixpanel_spark.operators.dedup import minhash_columns, staged_shingles


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """First-seen document per canonical content fingerprint.

    ``ts_col`` present: watermark + ``dropDuplicatesWithinWatermark`` —
    fingerprint state is purged once the watermark passes the horizon, so
    state size is bounded by arrival rate x delay instead of corpus size.
    ``ts_col`` absent: plain ``dropDuplicates`` (exact forever-dedup,
    state grows with distinct content — fine for bounded backfills via
    ``availableNow``, not for an unbounded feed; callers choose).
    """
    keyed = stream.withColumn("fp", fingerprint(text_col))
    if ts_col is not None:
        return keyed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["fp"]
        )
    return keyed.dropDuplicates(["fp"])


def streaming_minhash_signatures(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc MinHash signature over a stream: stateless, shuffle-free —
    identical values to the batch ``minhash_signature`` query (same column
    expressions), so signatures computed online and offline mix freely in
    one artifact table."""
    return staged_shingles(stream, id_col, text_col).select(
        "doc_id", *minhash_columns()
    )


def streaming_merge_edges(
    stream: DataFrame,
    run_time_ms: int = 0,
    ts_col: Optional[str] = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming form of ``transforms.amplitude.amp_merges`` (M5): emit
    each user_id<->device_id identity edge ONCE as events flow in, keyed
    by the same canonical insert_id the batch path dedupes on — so online
    and backfill edges land in one idempotent /import stream. The batch
    path's ``.distinct()`` becomes ``dropDuplicates`` on the canonical
    hash (watermark-bounded when ``ts_col`` is given: an edge re-observed
    after the horizon re-emits, which the sink's idempotent $merge
    semantics absorb)."""
    from tomixpanel_spark.functions.canonical import canonical_insert_id

    both = (
        F.col("user_id").isNotNull()
        & (F.col("user_id").cast("string") != "")
        & F.col("device_id").isNotNull()
        & (F.col("device_id").cast("string") != "")
    )
    edge = stream.filter(both).select(
        F.col("user_id").alias("id_a"),
        F.col("device_id").alias("id_b"),
        canonical_insert_id(
            F.lit("$merge"), F.col("user_id"), F.col("device_id")
        ).alias("insert_id"),
        F.lit(run_time_ms).cast("bigint").alias("time_ms"),
        *([F.col(ts_col)] if ts_col else []),
    )
    if ts_col is not None:
        deduped = edge.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["insert_id"]
        )
        return deduped.drop(ts_col)
    return edge.dropDuplicates(["insert_id"])
