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

__all__ = ["get_spark", "session_builder"]
__version__ = "0.1.0"
