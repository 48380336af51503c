"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + extensions.
``oracle_sql()`` — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tomixpanel_spark.operators import registry  # noqa: E402
from tomixpanel_spark.operators.base import table  # noqa: E402
from tomixpanel_spark.session import ensure_semantics  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the canonical event pipeline (coalesce identity -> md5
    $insert_id -> keep-first dedup -> per-type rollup) over sf0.001.

    This is the reference's amplitude path distilled to its relational
    core (SURVEY.md §3.1): identity resolution, deterministic surrogate
    keys, dedup, and summary counting in one plan.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ensure_semantics(spark)
    ev = table(spark, _SF0001, "events")
    user = F.when(F.col("user_id") % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.col("user_id").cast("string")
    )
    device = F.concat(F.lit("device:"), (F.col("user_id") % 50).cast("string"))
    canon = ev.select(
        F.col("event_type").alias("event"),
        F.coalesce(user, device, F.lit("")).alias("distinct_id"),
        F.unix_millis("ts").alias("time_ms"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("event_type"),
                F.col("user_id").cast("string"),
                F.unix_millis("ts").cast("string"),
                F.col("event_id").cast("string"),
            )
        ).alias("insert_id"),
    )
    w = Window.partitionBy("insert_id").orderBy("time_ms")
    deduped = canon.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("event").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("distinct_id").alias("n_identities"),
        F.min("time_ms").alias("first_ms"),
        F.max("time_ms").alias("last_ms"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_semantics(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(spec.fn) for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }
