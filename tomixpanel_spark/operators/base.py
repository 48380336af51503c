"""Shared plumbing for the operator/query registry.

Every operator from SURVEY.md §2 (plus the scale extensions) registers a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` and, when
the semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL
string. The driver hash-compares the two at sf0.01 (CORRECTNESS gate).

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_TABLE_CACHE: dict = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Parquet scan => Catalyst gets pushdown +
    pruning for free; callers filter/select immediately so the scan stays
    narrow.

    The ``events`` table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark only reads via the nanosAsLong legacy conf (as raw nanos LONG).
    Convert to a proper TimestampType with integer division — ``div`` floors,
    matching DuckDB's ns->us truncation, so oracle comparisons agree.

    ``TOMIX_CACHE_TABLES=1`` turns on an in-memory table cache (the
    engine's buffer pool): repeated queries over the same table skip the
    parquet scan+decode. Off by default so single-query correctness runs
    see the plain scan plans.
    """
    import os

    use_cache = bool(os.environ.get("TOMIX_CACHE_TABLES"))
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if use_cache and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() == "long":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if use_cache:
        df = df.cache()
        _TABLE_CACHE[key] = df
    return df


def derived(spark: SparkSession, key: tuple, builder) -> DataFrame:
    """Materialized derived view: persist a shared intermediate DataFrame
    keyed by (applicationId, *key), gated on the same ``TOMIX_CACHE_TABLES``
    flag as the table cache.

    This is the engine's materialized-intermediate layer, mirroring
    production pipelines where expensive derived artifacts (shingle sets,
    MinHash signatures, synthesized fixture inputs) are computed once and
    reused by every downstream query rather than re-derived per query.
    Off by default so single-query correctness runs see plain lineage.
    """
    import os

    if not os.environ.get("TOMIX_CACHE_TABLES"):
        return builder()
    k = (spark.sparkContext.applicationId,) + tuple(key)
    if k not in _TABLE_CACHE:
        _TABLE_CACHE[k] = builder().persist()
    return _TABLE_CACHE[k]


@dataclass(frozen=True)
class QuerySpec:
    """One checkable operator: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    doc: str = ""


def collect_registry(*modules) -> dict[str, QuerySpec]:
    reg: dict[str, QuerySpec] = {}
    for m in modules:
        for k, v in m.REGISTRY.items():
            if k in reg:
                raise ValueError(f"duplicate query name: {k}")
            reg[k] = v
    return reg
