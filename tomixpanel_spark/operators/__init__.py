"""Operator/query registry: one entry per implemented operator from
SURVEY.md §2 plus the scale extensions (dedup / similarity / text /
multimodal)."""

from tomixpanel_spark.operators import (
    analytics,
    asof,
    identity,
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    textops,
    transform_parity,
    ranges,
    packing,
)
from tomixpanel_spark.operators.base import QuerySpec, collect_registry
from tomixpanel_spark.sources import csv as csv_source

# Registry ordering policy
# ------------------------
# The external correctness gate samples the FIRST 50 registry entries, so
# ordering decides which queries get a hard external signal each round.
# Policy: queries that have NEVER been externally verified come FIRST;
# after them, rows ordered by how stale their last external check is;
# long-green rows rotate to the tail. NEW queries must be inserted in the
# NEVER-CHECKED block (top), never appended past position 50 — ordering a
# new query out of the checked window is gate evasion, not stability.
# Two e2e canaries (amp_transform / ga_transform) stay inside the window
# permanently: they exercise most of the §2 transform surface at once, so
# a regression anywhere in that stack shows up externally even mid-rotation.
#
# Last-external-check provenance (CORRECTNESS_rNN.json):
#   r6 green -> safe to rotate out this round; r1-r5 green rows that were
#   re-verified by r6's run keep their r6 tag. Every tail row additionally
#   has local DuckDB parity in tests/test_oracle_parity.py (all 76 run).
# _WINDOW holds EXACTLY the 50 externally-checked entries (length
# asserted at registry build, so inserting a new query without rotating
# one out fails loudly instead of silently shifting the boundary);
# _TAIL holds everything outside the gate.
_WINDOW = [
    # -- never externally checked: new queries insert HERE (see policy) ---
    "mixture_rebalance",  # added r7
    "neardup_keep_best",  # added r7
    "containment_pairs",  # added r7
    "segment_dedup",  # added r7
    "ann_ivf_q",  # added r7 (the integer-exact IVF: full oracle incl. training)
    # -- never externally checked (r1-r6): promoted to the window ---------
    "embedding_decontam",
    "simhash_pairs",
    "chunk_documents",
    "weighted_sample",
    "attribution_last_touch",
    "rolling_active_users",
    "tfidf_keywords",
    "balanced_shards",
    "salted_join_stats",
    "ann_lsh",
    "gopher_quality",
    "pii_redact",
    "kmv_distinct",
    "topk_per_group",
    "cms_heavy_hitters",
    "hypertable_rollup",
    "asof_latest_order",
    "range_join_active_windows",
    "lsh_keep_list",
    # -- rows-only so far (no SQL oracle until now): keep visible ---------
    "ann_ivf",
    # -- e2e canaries: permanently inside the window ----------------------
    "amp_transform",
    "ga_transform",
    # -- last checked r6; high-information rows kept inside ---------------
    "custom_dims",
    "identity_components",
    "neardup_components",
    "dedup_keep_list",
    "decontam_overlap",
    "minhash_lsh_pairs",
    "minhash_signature",
    "simhash",
    "ngram_jaccard_pairs",
    "dedup_exact",
    "cosine_topk",
    "cosine_topk_partitioned",
    "embedding_neardup",
    "multimodal_meta",
    "sessionize",
    "funnel",
    "retention",
    "value_quantiles",
    "set_ops",
    "event_sequences",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
]
# Entries below are OUTSIDE the external window: all r6-green (or
# earlier-green and re-verified green by the local oracle-parity suite
# every round), rotated out to make room for the never-checked block.
_TAIL = [
    "rollup_orders",  # rotated out r7 (r6-green) by ann_ivf_q
    "semi_join",  # rotated out r7 (r6-green) by segment_dedup
    "part_revenue",  # rotated out r7 (r6-green) by the three r7 additions
    "supplier_balance",  # rotated out r7 (r6-green)
    "pushdown_filter",  # rotated out r7 (r6-green; plan-locked in tests)
    "union_all",
    "pivot_status",
    "window_running",
    "map_merge",
    "time_normalize",
    "insert_id_md5",
    "when_chain",
    "session_bounds",
    "dedup_by_key",
    "merge_pairs",
    "time_shift",
    "schema_gate",
    "token_count",
    "word_freq",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "stratified_sample",
    "mixture_stats",
    "filter_nonempty",
    "coalesce_id",
    "explode_hits",
    "count_agg",
    "csv_scan",
    "project_rename",
    "project_drop",
]


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
    )
    if len(_WINDOW) != 50:
        raise ValueError(
            f"_WINDOW must hold exactly the 50 externally-checked entries, "
            f"got {len(_WINDOW)} — rotate a long-green row into _TAIL when "
            "inserting a new query"
        )
    order = _WINDOW + _TAIL
    missing = [n for n in order if n not in reg]
    extra = [n for n in reg if n not in order]
    if missing or extra:
        raise ValueError(
            f"registry/_WINDOW/_TAIL drift: missing={missing} unlisted={extra} — "
            "add new queries to the NEVER-CHECKED block at the top of _WINDOW"
        )
    return {n: reg[n] for n in order}


__all__ = ["registry", "QuerySpec"]
