"""Operator/query registry: one entry per implemented operator from
SURVEY.md §2 plus the scale extensions (dedup / similarity / text /
multimodal / streaming)."""

from tomixpanel_spark.operators import (
    analytics,
    asof,
    bpe,
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
    # -- new in round 11: never externally checked -------------------------
    "embedding_keep_list": 0,
    "hist_quantiles": 0,
    "bigram_lm_score": 0,
    "bpe_merges": 0,
    "bpe_token_count": 0,
    "seeded_shuffle": 0,
    # -- last green r8 ---------------------------------------------------
    "time_shift": 8,
    "token_count": 8,
    "tpch_q6": 8,
    "union_all": 8,
    "when_chain": 8,
    "window_running": 8,
    "word_freq": 8,
    # -- last green r9 ---------------------------------------------------
    "cagg_store_read": 9,
    "chunk_documents": 9,
    "cms_heavy_hitters": 9,
    "containment_pairs": 9,
    "cosine_topk": 9,
    "cosine_topk_partitioned": 9,
    "custom_dims": 9,
    "decontam_overlap": 9,
    "dedup_exact": 9,
    "dedup_index_probe": 9,
    "dedup_keep_list": 9,
    "embedding_decontam": 9,
    "embedding_neardup": 9,
    "event_sequences": 9,
    "funnel": 9,
    "gopher_quality": 9,
    "hypertable_rollup": 9,
    "identity_components": 9,
    "kmv_distinct": 9,
    "lsh_keep_list": 9,
    "minhash_lsh_pairs": 9,
    "minhash_signature": 9,
    "mixture_rebalance": 9,
    "multimodal_meta": 9,
    "neardup_components": 9,
    "neardup_keep_best": 9,
    "ngram_jaccard_pairs": 9,
    "pii_redact": 9,
    "range_join_active_windows": 9,
    "retention": 9,
    "rolling_active_users": 9,
    "salted_join_stats": 9,
    "segment_dedup": 9,
    "sessionize": 9,
    "set_ops": 9,
    "simhash": 9,
    "simhash_pairs": 9,
    "streaming_dedup_parity": 9,
    "streaming_incremental_parity": 9,
    "streaming_sketch_parity": 9,
    "streaming_stateful_parity": 9,
    "streaming_windowed_parity": 9,
    "substring_dedup_clean": 9,
    "substring_dup_spans": 9,
    "tfidf_keywords": 9,
    "topk_per_group": 9,
    "tpch_q1": 9,
    "tpch_q3": 9,
    # -- last green r10 --------------------------------------------------
    "amp_profiles": 10,
    "amp_transform": 10,
    "ann_ivf_q": 10,
    "ann_lsh": 10,
    "ann_pq_q": 10,
    "asof_latest_order": 10,
    "attribution_last_touch": 10,
    "balanced_shards": 10,
    "bm25_topk": 10,
    "coalesce_id": 10,
    "count_agg": 10,
    "csv_scan": 10,
    "dedup_by_key": 10,
    "doc_fingerprint": 10,
    "engage_reshape": 10,
    "explode_hits": 10,
    "filter_nonempty": 10,
    "ga_profiles": 10,
    "ga_transform": 10,
    "incremental_dedup": 10,
    "insert_id_md5": 10,
    "label_centroids": 10,
    "lang_id": 10,
    "map_merge": 10,
    "media_audio_features": 10,
    "media_image_resize": 10,
    "media_meta": 10,
    "media_neardup": 10,
    "media_video_frames": 10,
    "merge_pairs": 10,
    "mixture_stats": 10,
    "part_revenue": 10,
    "pivot_status": 10,
    "project_drop": 10,
    "project_rename": 10,
    "pushdown_filter": 10,
    "quality_score": 10,
    "reverse_events": 10,
    "rollup_orders": 10,
    "schema_gate": 10,
    "semi_join": 10,
    "session_bounds": 10,
    "stratified_sample": 10,
    "streaming_cagg_parity": 10,
    "substring_dup_stats": 10,
    "supplier_balance": 10,
    "time_normalize": 10,
    "tpch_q5": 10,
    "value_quantiles": 10,
    "weighted_sample": 10,
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
        bpe,
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
