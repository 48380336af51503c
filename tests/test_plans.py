"""Plan-shape regression tests: correctness tests prove results match;
these prove the PHYSICAL plan stays the one that survives 100 TB
(pushdown reaching the scan, pruned ReadSchema, dims broadcasting,
partial aggregation)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE
from tomixpanel_spark.operators import registry
from tomixpanel_spark.plans.audit import (
    exchange_count,
    join_strategies,
    pushed_filters,
    scan_columns,
)

REG = registry()


def test_filters_reach_parquet_scan(spark):
    df = REG["pushdown_filter"].fn(spark, SF_ORACLE)
    pushed = " ".join(pushed_filters(df))
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity" in pushed
    assert "In(l_returnflag" in pushed  # the S7 event-list pushdown


def test_column_pruning_narrows_read_schema(spark):
    df = REG["project_drop"].fn(spark, SF_ORACLE)
    cols = scan_columns(df)
    assert "props" not in cols and "value" not in cols


def test_q5_broadcasts_dims(spark):
    df = REG["tpch_q5"].fn(spark, SF_ORACLE)
    joins = join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 2  # nation + region at minimum


def test_q1_partial_aggregation_single_shuffle(spark):
    df = REG["tpch_q1"].fn(spark, SF_ORACLE)
    # one agg exchange (+ possibly one AQE read) — never a sort or join
    assert exchange_count(df) <= 2
    assert join_strategies(df) == []


def test_minhash_signature_no_join_no_agg_exchange(spark):
    """Signature is a narrow projection after the parallelism repartition —
    exactly one user exchange, no join."""
    df = REG["minhash_signature"].fn(spark, SF_ORACLE)
    assert join_strategies(df) == []
    # the parallelism repartition is the only exchange (formatted output may
    # list the node in both the tree and the details section)
    assert exchange_count(df) <= 2
