"""Identity-graph resolution: transitive closure of $merge edges.

The reference emits pairwise user<->device merge edges and lets Mixpanel's
backend resolve identity clusters (transform/amplitudeToMixpanel.js:
173-219). A standalone engine must resolve them itself: connected
components over the merge-edge graph, so every alias maps to one canonical
identity.

Algorithm: iterative label propagation (hash-min) to a fixed point —
each node repeatedly adopts the smallest label among itself and its
neighbors. Pure DataFrame joins/aggregations per iteration; converges in
O(diameter) rounds (identity graphs are shallow — user/device stars —
so 2-4 rounds in practice). This is the large-graph-safe pattern
(GraphFrames' CC is the same idea); each round is one join + one
aggregate, partitioned by node id.

The oracle mirrors it with a recursive CTE (min reachable node id) —
feasible at test scale, while the Spark loop is the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, table

MAX_ITERATIONS = 20


def connected_components(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """edges(a,b) -> (node, component) with component = min node id in the
    cluster (string ids; min is lexicographic, deterministic)."""
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    ).distinct()
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    converged = False
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint(eager=True)  # materialize ONCE, truncate lineage
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ITERATIONS} "
            "iterations (graph diameter too large) — raise MAX_ITERATIONS"
        )
    return labels


def identity_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC over the synthesized user<->device merge edges (same edge rule as
    the merge_pairs query): every user sharing a device collapses into one
    identity cluster."""
    ev = table(spark, sf_dir, "events")
    user = F.when(F.col("user_id") % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("u"), F.col("user_id").cast("string"))
    )
    dev = F.concat(F.lit("d"), (F.col("user_id") % 50).cast("string"))
    edges = (
        ev.select(user.alias("id_a"), dev.alias("id_b"))
        .filter(F.col("id_a").isNotNull())
        .distinct()
    )
    return connected_components(edges)


_IDENTITY_COMPONENTS_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS id_a,
         'd' || CAST(user_id % 50 AS VARCHAR) AS id_b
  FROM events WHERE user_id % 3 <> 0),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION SELECT id_b, id_a FROM edges),
walk(node, reach) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM sym)
  UNION
  SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach)
SELECT node, min(reach) AS component FROM walk GROUP BY node
"""


REGISTRY = {
    "identity_components": QuerySpec(
        identity_components, _IDENTITY_COMPONENTS_SQL, "identity graph CC"
    ),
}
