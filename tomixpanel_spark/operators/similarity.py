"""Embedding similarity search over ``embeddings`` (array<float>, dim 64).

Operators:
  * ``cosine_topk`` — brute-force cosine top-k: the correctness baseline.
    Queries are broadcast; candidates stream partition-parallel, so the
    scan scales linearly with executors and never shuffles the corpus —
    only the per-query top-k rows move (window over q_id).
  * ``cosine_topk_partitioned`` — IVF-style pruned search: restrict the
    scan to the query's coarse partition (the ``label`` column plays the
    centroid-assignment role). At 100 TB this is the scale path: cluster
    assignment turns top-k from full-scan into per-cell scan; pair it with
    partitioned parquet layout for partition pruning at the source.
  * ``embedding_neardup`` — all pairs above a cosine threshold (embedding
    near-duplicate detection).

Float parity: similarity is emitted as ``sim_e6`` (similarity * 1e6 rounded
to BIGINT). Rounded-integer output makes the DuckDB comparison robust to
last-ULP differences in float summation order, and ranking happens on the
rounded value + id tiebreak so ranks are identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tomixpanel_spark.functions.vectors import cosine_similarity
from tomixpanel_spark.operators.base import QuerySpec, table

N_QUERIES = 10
TOP_K = 5
NEARDUP_E6 = 400_000  # cosine >= 0.40 (synthetic corpus max ~0.51)

_SQL_SIM = (
    "CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT)"
)


def _sim_e6(a, b):
    return F.round(cosine_similarity(a, b) * 1_000_000).cast("bigint")


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k neighbors for the first N_QUERIES vectors."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", _sim_e6("q_emb", "n_emb").alias("sim_e6"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e6").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "sim_e6")
    )


_COSINE_TOPK_SQL = f"""
SELECT q_id, neighbor_id, rank, sim_e6 FROM (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         {_SQL_SIM} AS sim_e6,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_SQL_SIM} DESC, b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES})
WHERE rank <= {TOP_K}
"""


def cosine_topk_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style pruned top-k: only candidates in the query's coarse cell
    (label) are scanned — the 100 TB path (cell assignment = kmeans/LSH in
    production; here the fixture's label column)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label"), F.col("embedding").alias("n_emb")
    )
    scored = (
        c.join(F.broadcast(q), (F.col("label") == F.col("q_label")) & (F.col("neighbor_id") != F.col("q_id")))
        .select("q_id", "neighbor_id", _sim_e6("q_emb", "n_emb").alias("sim_e6"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e6").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id", "rank", "sim_e6")
    )


_COSINE_TOPK_PART_SQL = f"""
SELECT q_id, neighbor_id, rank, sim_e6 FROM (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         {_SQL_SIM} AS sim_e6,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_SQL_SIM} DESC, b.vec_id) AS rank
  FROM embeddings a
  JOIN embeddings b ON b.label = a.label AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES})
WHERE rank <= 3
"""


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= 0.40).

    Brute pair scan here; the scale path reuses the partitioned variant
    (only intra-cell pairs) or LSH bucketing from the dedup module.
    """
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _sim_e6("a_emb", "b_emb").alias("sim_e6"))
        .filter(F.col("sim_e6") >= NEARDUP_E6)
    )


_EMBEDDING_NEARDUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_SQL_SIM} AS sim_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_SQL_SIM} >= {NEARDUP_E6}
"""


REGISTRY = {
    "cosine_topk": QuerySpec(cosine_topk, _COSINE_TOPK_SQL, "ext:similarity"),
    "cosine_topk_partitioned": QuerySpec(
        cosine_topk_partitioned, _COSINE_TOPK_PART_SQL, "ext:similarity"
    ),
    "embedding_neardup": QuerySpec(embedding_neardup, _EMBEDDING_NEARDUP_SQL, "ext:similarity"),
}
