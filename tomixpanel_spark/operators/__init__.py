"""Operator/query registry: one entry per implemented operator from
SURVEY.md §2 plus the scale extensions (dedup / similarity / text /
multimodal / streaming)."""

from tomixpanel_spark.operators import (
    analytics,
    asof,
    identity,
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    streaming_parity,
    textops,
    transform_parity,
    ranges,
    packing,
)
from tomixpanel_spark.operators.base import QuerySpec, collect_registry
from tomixpanel_spark.sources import csv as csv_source

# Registry ordering policy (machine-readable rotation log)
# --------------------------------------------------------
# The external correctness gate samples the FIRST 50 registry entries,
# so ordering decides which queries get a hard external signal each
# round. The policy, now DERIVED from the log below instead of a
# hand-maintained list (round-7 advice: keep the last-external-check
# round machine-readable and rotate on a fixed cadence):
#
#   1. queries NEVER externally verified (round 0) come first — new
#      queries enter here by construction; ordering a new query out of
#      the checked window is gate evasion, not stability;
#   2. the two e2e canaries (amp_transform / ga_transform) are pinned
#      inside the window permanently: they exercise most of the §2
#      transform surface at once, so a regression anywhere in that
#      stack shows up externally even mid-rotation;
#   3. everything else orders by STALENESS (ascending last-green round,
#      then name) — every query re-enters the 50-row window within
#      ceil(registry/50 rotation) rounds.
#
# _LAST_EXTERNAL is the log: query -> last round whose external
# CORRECTNESS_r{NN}.json recorded rows+hash green (0 = never checked).
# Update it at the START of each round from the previous round's file;
# the ordering then rotates automatically. Every tail row additionally
# has local DuckDB parity in tests/test_oracle_parity.py every round.
_CANARIES = ("amp_transform", "ga_transform")
_LAST_EXTERNAL = {
    # -- new in round 8: never externally checked --------------------------
    "ann_pq_q": 0,
    "incremental_dedup": 0,
    "substring_dup_stats": 0,
    "bm25_topk": 0,
    "label_centroids": 0,
    "tpch_q6": 0,
    "media_image_resize": 0,
    "media_video_frames": 0,
    "media_audio_features": 0,
    "media_meta": 0,
    "media_neardup": 0,
    "streaming_cagg_parity": 0,
    # -- last green r3/r5 (stalest: first into the r8 window) --------------
    "project_drop": 3,
    "project_rename": 3,
    "coalesce_id": 5,
    "count_agg": 5,
    "csv_scan": 5,
    "explode_hits": 5,
    "filter_nonempty": 5,
    # -- last green r6 -----------------------------------------------------
    "dedup_by_key": 6,
    "doc_fingerprint": 6,
    "insert_id_md5": 6,
    "lang_id": 6,
    "map_merge": 6,
    "merge_pairs": 6,
    "mixture_stats": 6,
    "part_revenue": 6,
    "pivot_status": 6,
    "pushdown_filter": 6,
    "quality_score": 6,
    "rollup_orders": 6,
    "schema_gate": 6,
    "semi_join": 6,
    "session_bounds": 6,
    "stratified_sample": 6,
    "supplier_balance": 6,
    "time_normalize": 6,
    "time_shift": 6,
    "token_count": 6,
    "union_all": 6,
    "when_chain": 6,
    "window_running": 6,
    "word_freq": 6,
    # -- last green r7 (freshest: tail candidates) -------------------------
    "amp_transform": 7,
    "ann_ivf_q": 7,
    "ann_lsh": 7,
    "asof_latest_order": 7,
    "attribution_last_touch": 7,
    "balanced_shards": 7,
    "chunk_documents": 7,
    "cms_heavy_hitters": 7,
    "containment_pairs": 7,
    "cosine_topk": 7,
    "cosine_topk_partitioned": 7,
    "custom_dims": 7,
    "decontam_overlap": 7,
    "dedup_exact": 7,
    "dedup_keep_list": 7,
    "embedding_decontam": 7,
    "embedding_neardup": 7,
    "event_sequences": 7,
    "funnel": 7,
    "ga_transform": 7,
    "gopher_quality": 7,
    "hypertable_rollup": 7,
    "identity_components": 7,
    "kmv_distinct": 7,
    "lsh_keep_list": 7,
    "minhash_lsh_pairs": 7,
    "minhash_signature": 7,
    "mixture_rebalance": 7,
    "multimodal_meta": 7,
    "neardup_components": 7,
    "neardup_keep_best": 7,
    "ngram_jaccard_pairs": 7,
    "pii_redact": 7,
    "range_join_active_windows": 7,
    "retention": 7,
    "rolling_active_users": 7,
    "salted_join_stats": 7,
    "segment_dedup": 7,
    "sessionize": 7,
    "set_ops": 7,
    "simhash": 7,
    "simhash_pairs": 7,
    "tfidf_keywords": 7,
    "topk_per_group": 7,
    "tpch_q1": 7,
    "tpch_q3": 7,
    "tpch_q5": 7,
    "value_quantiles": 7,
    "weighted_sample": 7,
}

WINDOW_SIZE = 50  # the driver samples this many leading registry entries


def ordered_names() -> list[str]:
    """Registry order derived from the rotation log: never-checked
    first, canaries pinned behind them, then staleness-ascending."""
    never = sorted(q for q, r in _LAST_EXTERNAL.items() if r == 0)
    rest = sorted(
        (q for q, r in _LAST_EXTERNAL.items() if r > 0 and q not in _CANARIES),
        key=lambda q: (_LAST_EXTERNAL[q], q),
    )
    return never + list(_CANARIES) + rest


def registry() -> dict[str, QuerySpec]:
    reg = collect_registry(
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
        asof,
        ranges,
        packing,
        streaming_parity,
    )
    order = ordered_names()
    missing = [n for n in order if n not in reg]
    extra = [n for n in reg if n not in order]
    if missing or extra:
        raise ValueError(
            f"registry/_LAST_EXTERNAL drift: missing={missing} unlisted={extra} — "
            "every registered query needs a rotation-log row (0 = never "
            "externally checked)"
        )
    return {n: reg[n] for n in order}


__all__ = ["registry", "QuerySpec", "ordered_names", "WINDOW_SIZE"]
