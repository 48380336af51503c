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
    # -- last green r11 ---------------------------------------------
    "event_sequences": 11,
    "funnel": 11,
    "hist_quantiles": 11,
    "hypertable_rollup": 11,
    "identity_components": 11,
    "kmv_distinct": 11,
    "range_join_active_windows": 11,
    "retention": 11,
    "rolling_active_users": 11,
    "segment_dedup": 11,
    "sessionize": 11,
    "set_ops": 11,
    "time_shift": 11,
    "token_count": 11,
    "tpch_q6": 11,
    "union_all": 11,
    "when_chain": 11,
    "window_running": 11,
    "word_freq": 11,
    # -- last green r12 ---------------------------------------------
    "amp_profiles": 12,
    "ann_ivf_q": 12,
    "ann_lsh": 12,
    "ann_pq_q": 12,
    "asof_latest_order": 12,
    "asof_next_order": 12,
    "attribution_last_touch": 12,
    "balanced_shards": 12,
    "bm25_topk": 12,
    "chunk_by_bpe": 12,
    "coalesce_id": 12,
    "count_agg": 12,
    "csv_scan": 12,
    "dedup_by_key": 12,
    "doc_fingerprint": 12,
    "dsir_weights": 12,
    "engage_reshape": 12,
    "explode_hits": 12,
    "filter_nonempty": 12,
    "ga_profiles": 12,
    "incremental_dedup": 12,
    "insert_id_md5": 12,
    "label_centroids": 12,
    "lang_id": 12,
    "map_merge": 12,
    "media_audio_features": 12,
    "media_image_resize": 12,
    "media_meta": 12,
    "media_neardup": 12,
    "media_video_frames": 12,
    "merge_pairs": 12,
    "mixture_stats": 12,
    "part_revenue": 12,
    "pivot_status": 12,
    "simhash": 12,
    "simhash_pairs": 12,
    "streaming_dedup_parity": 12,
    "streaming_incremental_parity": 12,
    "streaming_sketch_parity": 12,
    "streaming_stateful_parity": 12,
    "streaming_windowed_parity": 12,
    "substring_dedup_clean": 12,
    "substring_dup_spans": 12,
    "tfidf_keywords": 12,
    "topk_per_group": 12,
    "tpch_q1": 12,
    "tpch_q3": 12,
    # -- last green r13 ---------------------------------------------
    "amp_transform": 13,
    "bigram_lm_score": 13,
    "bpe_encode": 13,
    "bpe_merges": 13,
    "bpe_token_count": 13,
    "cagg_store_read": 13,
    "chunk_documents": 13,
    "cms_heavy_hitters": 13,
    "containment_pairs": 13,
    "cosine_topk": 13,
    "cosine_topk_partitioned": 13,
    "custom_dims": 13,
    "decontam_overlap": 13,
    "dedup_exact": 13,
    "dedup_index_probe": 13,
    "dedup_keep_list": 13,
    "embedding_decontam": 13,
    "embedding_keep_list": 13,
    "embedding_neardup": 13,
    "ga_transform": 13,
    "gopher_quality": 13,
    "gopher_repetition": 13,
    "lsh_keep_list": 13,
    "minhash_lsh_pairs": 13,
    "minhash_signature": 13,
    "mixture_rebalance": 13,
    "multimodal_meta": 13,
    "neardup_components": 13,
    "neardup_keep_best": 13,
    "ngram_jaccard_pairs": 13,
    "pii_redact": 13,
    "project_drop": 13,
    "project_rename": 13,
    "pushdown_filter": 13,
    "quality_score": 13,
    "reverse_events": 13,
    "rollup_orders": 13,
    "salted_join_stats": 13,
    "schema_gate": 13,
    "seeded_shuffle": 13,
    "semi_join": 13,
    "session_bounds": 13,
    "stratified_sample": 13,
    "streaming_cagg_parity": 13,
    "substring_dup_stats": 13,
    "supplier_balance": 13,
    "time_normalize": 13,
    "tpch_q5": 13,
    "value_quantiles": 13,
    "weighted_sample": 13,
}

WINDOW_SIZE = 50  # the driver samples this many leading registry entries

# Changed-code-outranks-staleness (round-11 verdict #7): _CHECKED_SRC
# records, per query, the hash of its implementing module (plus that
# module's declared ROTATION_DEPS helper files) AS OF the round marker
# commit of the query's last external green. A query whose current code
# hash differs was rewritten after its last hard driver check, so it
# jumps the staleness queue — e.g. the r11 streaming rewrites whose last
# green was r9. Regenerate both maps at the start of each round with
# tools/update_rotation.py. Hash values are REPLACED below by the
# generator; the mechanism (not the values) is what tests lock.
_CHECKED_SRC: dict[str, str] = {
    "amp_profiles": "293d0cd6880d",
    "amp_transform": "293d0cd6880d",
    "ann_ivf_q": "1695ce43652c",
    "ann_lsh": "1695ce43652c",
    "ann_pq_q": "1695ce43652c",
    "asof_latest_order": "eb169deaac05",
    "asof_next_order": "eb169deaac05",
    "attribution_last_touch": "eb169deaac05",
    "balanced_shards": "05cd502b9ba7",
    "bigram_lm_score": "858640781c09",
    "bm25_topk": "35135cf2accd",
    "bpe_encode": "2d231f5053c6",
    "bpe_merges": "2d231f5053c6",
    "bpe_token_count": "2d231f5053c6",
    "cagg_store_read": "05c6c330556d",
    "chunk_by_bpe": "338212282bcf",
    "chunk_documents": "858640781c09",
    "cms_heavy_hitters": "858640781c09",
    "coalesce_id": "67628408c0b0",
    "containment_pairs": "1b8824f32218",
    "cosine_topk": "1695ce43652c",
    "cosine_topk_partitioned": "1695ce43652c",
    "count_agg": "67628408c0b0",
    "csv_scan": "528b903a0c7d",
    "custom_dims": "293d0cd6880d",
    "decontam_overlap": "1b8824f32218",
    "dedup_by_key": "67628408c0b0",
    "dedup_exact": "1b8824f32218",
    "dedup_index_probe": "05c6c330556d",
    "dedup_keep_list": "1b8824f32218",
    "doc_fingerprint": "35135cf2accd",
    "dsir_weights": "35135cf2accd",
    "embedding_decontam": "1695ce43652c",
    "embedding_keep_list": "1695ce43652c",
    "embedding_neardup": "1695ce43652c",
    "engage_reshape": "293d0cd6880d",
    "event_sequences": "ae50a9a9c900",
    "explode_hits": "35135cf2accd",
    "filter_nonempty": "67628408c0b0",
    "funnel": "ae50a9a9c900",
    "ga_profiles": "293d0cd6880d",
    "ga_transform": "293d0cd6880d",
    "gopher_quality": "858640781c09",
    "gopher_repetition": "858640781c09",
    "hist_quantiles": "ae50a9a9c900",
    "hypertable_rollup": "ae50a9a9c900",
    "identity_components": "506713212010",
    "incremental_dedup": "1b8824f32218",
    "insert_id_md5": "67628408c0b0",
    "kmv_distinct": "ae50a9a9c900",
    "label_centroids": "1695ce43652c",
    "lang_id": "35135cf2accd",
    "lsh_keep_list": "1b8824f32218",
    "map_merge": "67628408c0b0",
    "media_audio_features": "8b4a183f8093",
    "media_image_resize": "8b4a183f8093",
    "media_meta": "8b4a183f8093",
    "media_neardup": "8b4a183f8093",
    "media_video_frames": "8b4a183f8093",
    "merge_pairs": "67628408c0b0",
    "minhash_lsh_pairs": "1b8824f32218",
    "minhash_signature": "1b8824f32218",
    "mixture_rebalance": "858640781c09",
    "mixture_stats": "35135cf2accd",
    "multimodal_meta": "3a138906be47",
    "neardup_components": "1b8824f32218",
    "neardup_keep_best": "1b8824f32218",
    "ngram_jaccard_pairs": "1b8824f32218",
    "part_revenue": "332637c7e0bf",
    "pii_redact": "858640781c09",
    "pivot_status": "332637c7e0bf",
    "project_drop": "332637c7e0bf",
    "project_rename": "332637c7e0bf",
    "pushdown_filter": "332637c7e0bf",
    "quality_score": "858640781c09",
    "range_join_active_windows": "b6ba9074d9cd",
    "retention": "ae50a9a9c900",
    "reverse_events": "293d0cd6880d",
    "rolling_active_users": "ae50a9a9c900",
    "rollup_orders": "332637c7e0bf",
    "salted_join_stats": "332637c7e0bf",
    "schema_gate": "67628408c0b0",
    "seeded_shuffle": "05cd502b9ba7",
    "segment_dedup": "53520182f820",
    "semi_join": "332637c7e0bf",
    "session_bounds": "67628408c0b0",
    "sessionize": "ae50a9a9c900",
    "set_ops": "ae50a9a9c900",
    "simhash": "1b8824f32218",
    "simhash_pairs": "1b8824f32218",
    "stratified_sample": "858640781c09",
    "streaming_cagg_parity": "05c6c330556d",
    "streaming_dedup_parity": "44cf8607048b",
    "streaming_incremental_parity": "44cf8607048b",
    "streaming_sketch_parity": "44cf8607048b",
    "streaming_stateful_parity": "44cf8607048b",
    "streaming_windowed_parity": "44cf8607048b",
    "substring_dedup_clean": "1b8824f32218",
    "substring_dup_spans": "1b8824f32218",
    "substring_dup_stats": "1b8824f32218",
    "supplier_balance": "332637c7e0bf",
    "tfidf_keywords": "35135cf2accd",
    "time_normalize": "67628408c0b0",
    "time_shift": "bc4aae97b654",
    "token_count": "53520182f820",
    "topk_per_group": "332637c7e0bf",
    "tpch_q1": "332637c7e0bf",
    "tpch_q3": "332637c7e0bf",
    "tpch_q5": "332637c7e0bf",
    "tpch_q6": "1e54db3a40b3",
    "union_all": "1e54db3a40b3",
    "value_quantiles": "ae50a9a9c900",
    "weighted_sample": "858640781c09",
    "when_chain": "bc4aae97b654",
    "window_running": "1e54db3a40b3",
    "word_freq": "53520182f820",
}


def _collect() -> dict[str, QuerySpec]:
    return collect_registry(
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


_HASH_CACHE: dict[str, str] = {}


def code_hash(modname: str) -> str:
    """Current working-tree hash of a module file + its ROTATION_DEPS."""
    h = _HASH_CACHE.get(modname)
    if h is None:
        import hashlib

        md5 = hashlib.md5()
        for rel in module_relpaths(modname):
            repo = _repo_root()
            try:
                with open(f"{repo}/{rel}", "rb") as f:
                    md5.update(f.read())
            except OSError:
                pass
        h = _HASH_CACHE[modname] = md5.hexdigest()[:12]
    return h


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def module_relpaths(modname: str) -> list[str]:
    """Repo-relative source files the rotation hash covers for a module:
    the module itself plus its declared ROTATION_DEPS (one level)."""
    import importlib
    import os

    repo = _repo_root()
    mod = importlib.import_module(modname)
    paths = {os.path.relpath(mod.__file__, repo)}
    for dep in getattr(mod, "ROTATION_DEPS", ()):
        d = importlib.import_module(dep)
        paths.add(os.path.relpath(d.__file__, repo))
    return sorted(paths)


def changed_since_green(reg: dict[str, QuerySpec] | None = None) -> set[str]:
    """Queries whose implementing code changed after their last external
    green (recorded hash != current hash). Never-checked rows excluded —
    they already lead the window."""
    if reg is None:
        reg = _collect()
    out = set()
    for q, recorded in _CHECKED_SRC.items():
        if _LAST_EXTERNAL.get(q, 0) > 0 and q in reg:
            if recorded != code_hash(reg[q].fn.__module__):
                out.add(q)
    return out


def _derive_order(
    last_external: dict[str, int],
    canaries: tuple[str, ...],
    changed: set[str],
) -> list[str]:
    """Pure ordering rule (unit-testable): never-checked first, canaries
    pinned, then changed-since-green rows by (staleness, name) — code
    changed after its last hard check outranks plain staleness — then
    the unchanged rest by (staleness, name)."""
    never = sorted(q for q, r in last_external.items() if r == 0)
    pool = [
        q for q, r in last_external.items() if r > 0 and q not in canaries
    ]
    bumped = sorted(
        (q for q in pool if q in changed),
        key=lambda q: (last_external[q], q),
    )
    rest = sorted(
        (q for q in pool if q not in changed),
        key=lambda q: (last_external[q], q),
    )
    return never + list(canaries) + bumped + rest


def ordered_names(reg: dict[str, QuerySpec] | None = None) -> list[str]:
    """Registry order derived from the rotation log + code-change log."""
    if reg is None:
        reg = _collect()
    return _derive_order(_LAST_EXTERNAL, _CANARIES, changed_since_green(reg))


def registry() -> dict[str, QuerySpec]:
    reg = _collect()
    order = ordered_names(reg)
    missing = [n for n in order if n not in reg]
    extra = [n for n in reg if n not in order]
    if missing or extra:
        raise ValueError(
            f"registry/_LAST_EXTERNAL drift: missing={missing} unlisted={extra} — "
            "every registered query needs a rotation-log row (0 = never "
            "externally checked)"
        )
    return {n: reg[n] for n in order}


__all__ = [
    "registry",
    "QuerySpec",
    "ordered_names",
    "WINDOW_SIZE",
    "changed_since_green",
    "code_hash",
    "module_relpaths",
]
