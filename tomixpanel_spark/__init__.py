"""tomixpanel_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL tool ak--47/toMixpanel (event pipelines: Amplitude / GA360 /
CSV / Mixpanel sources -> canonical Mixpanel events / profiles / identity
merges -> HTTP sinks), extended with the large-scale training-data-pipeline
operators a 100 TB deployment needs (exact + fuzzy dedup, embedding
similarity search, multimodal column plumbing, text analysis).

Design stance (see ARCHITECTURE.md):
  * Everything is a DataFrame; logical plans are declared with the
    DataFrame/SQL API and Catalyst + Tungsten choose the physical strategy.
  * No RDDs, no custom Catalyst rules. Python touches data only through
    Arrow-batched pandas UDFs, and only where built-ins can't express the
    semantics (HTTP sinks, multimodal decode).
  * Sessions pin UTC + LAST_WIN map semantics (reference parity) and AQE.
"""

from tomixpanel_spark.session import get_spark, session_builder


def __getattr__(name):
    # Lazy re-exports of the main user-facing operator APIs (keeps package
    # import light: operators pull in pandas/pyarrow machinery).
    lazy = {
        "dedup_pipeline": ("tomixpanel_spark.operators.dedup", "dedup_pipeline"),
        "near_dup_pairs": ("tomixpanel_spark.operators.dedup", "near_dup_pairs"),
        "connected_components": (
            "tomixpanel_spark.operators.identity",
            "connected_components",
        ),
        "extract_metadata": (
            "tomixpanel_spark.operators.multimodal",
            "extract_metadata",
        ),
        "transform_media": ("tomixpanel_spark.operators.multimodal", "transform_media"),
        "amplitude_to_mixpanel": (
            "tomixpanel_spark.transforms.amplitude",
            "amplitude_to_mixpanel",
        ),
        "ga_events": ("tomixpanel_spark.transforms.ga", "ga_events"),
        "streaming_exact_dedup": (
            "tomixpanel_spark.streaming.dedup",
            "streaming_exact_dedup",
        ),
        "streaming_minhash_signatures": (
            "tomixpanel_spark.streaming.dedup",
            "streaming_minhash_signatures",
        ),
        "streaming_merge_edges": (
            "tomixpanel_spark.streaming.dedup",
            "streaming_merge_edges",
        ),
        "segment_dedup_for": (
            "tomixpanel_spark.operators.textops",
            "segment_dedup_for",
        ),
        "ann_ivf_quantized": (
            "tomixpanel_spark.operators.similarity",
            "ann_ivf_quantized",
        ),
        "pack_sequences": ("tomixpanel_spark.operators.packing", "pack_sequences"),
        "lpt_shards": ("tomixpanel_spark.operators.packing", "lpt_shards"),
        "seeded_shuffle": ("tomixpanel_spark.operators.packing", "seeded_shuffle"),
        "bigram_lm_score": ("tomixpanel_spark.operators.textops", "bigram_lm_score"),
        "salted_join": ("tomixpanel_spark.functions.skew", "salted_join"),
        "asof_join": ("tomixpanel_spark.operators.asof", "asof_join"),
        "range_join": ("tomixpanel_spark.operators.ranges", "range_join"),
        "embedding_decontam_pairs": (
            "tomixpanel_spark.operators.similarity",
            "embedding_decontam_pairs",
        ),
        "embedding_neardup_pairs": (
            "tomixpanel_spark.operators.similarity",
            "embedding_neardup_pairs",
        ),
        "perceptual_hash": (
            "tomixpanel_spark.operators.multimodal",
            "perceptual_hash",
        ),
        "decode_image_gray": (
            "tomixpanel_spark.operators.multimodal",
            "decode_image_gray",
        ),
        "DedupIndex": (
            "tomixpanel_spark.streaming.dedup_index",
            "DedupIndex",
        ),
        "sessionize_session_window": (
            "tomixpanel_spark.streaming.stateful",
            "sessionize_session_window",
        ),
        "StreamingCountMin": (
            "tomixpanel_spark.streaming.sketches",
            "StreamingCountMin",
        ),
        "ContinuousAggregate": (
            "tomixpanel_spark.streaming.cagg",
            "ContinuousAggregate",
        ),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_spark",
    "session_builder",
    "dedup_pipeline",
    "near_dup_pairs",
    "connected_components",
    "extract_metadata",
    "transform_media",
    "amplitude_to_mixpanel",
    "ga_events",
    "streaming_exact_dedup",
    "streaming_minhash_signatures",
    "streaming_merge_edges",
    "segment_dedup_for",
    "ann_ivf_quantized",
    "pack_sequences",
    "lpt_shards",
    "seeded_shuffle",
    "bigram_lm_score",
    "salted_join",
    "asof_join",
    "range_join",
    "embedding_decontam_pairs",
    "embedding_neardup_pairs",
    "perceptual_hash",
    "decode_image_gray",
    "DedupIndex",
    "sessionize_session_window",
    "StreamingCountMin",
    "ContinuousAggregate",
]
__version__ = "0.1.0"
