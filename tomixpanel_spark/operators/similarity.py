"""Embedding similarity search over ``embeddings`` (array<float>, dim 64).

Operators:
  * ``cosine_topk`` — brute-force cosine top-k: the correctness baseline.
  * ``cosine_topk_partitioned`` — IVF-style pruned search: restrict the
    scan to the query's coarse partition (the ``label`` column plays the
    centroid-assignment role). At 100 TB this is the scale path: cell
    assignment turns top-k from full-scan into per-cell scan.
  * ``embedding_neardup`` — all pairs above a cosine threshold.

Execution strategy (the 100 TB shape):
  * Vectors are L2-normalized ONCE in a narrow projection (JVM higher-order
    fold), so similarity reduces to a dot product.
  * The pair scan runs as an Arrow-batched ``mapInPandas`` stage: the small
    side (queries / corpus block) is a numpy matrix captured in the closure
    (broadcast-equivalent), and each candidate batch computes one BLAS
    matmul — thousands of dot products per syscall instead of one
    expression-tree fold per pair. Candidates stream partition-parallel;
    nothing shuffles except the emitted (pair, sim) rows.
  * Each batch emits only its LOCAL top-k (for top-k) or above-threshold
    pairs (for near-dup), so the final window/distinct shuffle carries
    k*batches rows, not |corpus| x |queries|.

Float parity: similarity is emitted as ``sim_e6`` (sim * 1e6 rounded to
BIGINT). numpy's pairwise summation differs from DuckDB's sequential fold
by ~1 ulp; integer-rounding at 1e-6 absorbs it, and ranking happens on the
rounded value + id tiebreak so ranks are identical across engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, table
from tomixpanel_spark.session import ship_package

N_QUERIES = 10
TOP_K = 5
NEARDUP_E6 = 400_000  # cosine >= 0.40 (synthetic corpus max ~0.51)

_SQL_SIM = (
    "CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT)"
)


def _unit(df: DataFrame, id_name: str, label: bool = False) -> DataFrame:
    """Narrow projection: id + L2-normalized double vector (one JVM fold)."""
    v = F.col("embedding").cast("array<double>")
    dot = F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    cols = [F.col("vec_id").alias(id_name), F.transform(v, lambda x: x / F.sqrt(dot)).alias("unit")]
    if label:
        cols.append(F.col("label"))
    return df.select(*cols)


def _collect_matrix(df: DataFrame, id_name: str):
    """Small side -> (ids, numpy matrix) captured in the UDF closure."""
    import numpy as np

    pdf = df.toPandas()  # Arrow transfer: columnar, ~5x faster than collect
    ids = pdf[id_name].to_numpy(dtype="int64")
    mat = np.array(list(pdf["unit"]), dtype="float64")
    return ids, mat


def _scored_pairs(
    cand: DataFrame, q_ids, q_mat, local_k: int | None, threshold_e6: int | None,
    q_labels=None,
) -> DataFrame:
    """mapInPandas stage: candidate batches x query matrix -> sim_e6 rows."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            c = np.array(list(pdf["unit"]), dtype="float64")  # (B, d)
            sims = c @ q_mat.T  # (B, Q) one BLAS call per batch
            e6 = np.rint(sims * 1_000_000).astype("int64")
            n_ids = pdf["neighbor_id"].to_numpy()
            out = []
            for qi in range(len(q_ids)):
                col = e6[:, qi]
                mask = n_ids != q_ids[qi]
                if q_labels is not None:
                    mask &= pdf["label"].to_numpy() == q_labels[qi]
                if threshold_e6 is not None:
                    mask &= col >= threshold_e6
                idx = np.nonzero(mask)[0]
                if local_k is not None and len(idx) > local_k:
                    # local top-k per batch: only k rows survive to shuffle
                    order = np.lexsort((n_ids[idx], -col[idx]))
                    idx = idx[order[:local_k]]
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(len(idx), q_ids[qi], dtype="int64"),
                            "neighbor_id": n_ids[idx],
                            "sim_e6": col[idx],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"q_id": [], "neighbor_id": [], "sim_e6": []}
            )

    ship_package(cand.sparkSession)
    return cand.mapInPandas(batches, schema="q_id long, neighbor_id long, sim_e6 long")


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k neighbors for the first N_QUERIES vectors."""
    emb = table(spark, sf_dir, "embeddings")
    q_ids, q_mat = _collect_matrix(
        _unit(emb.filter(F.col("vec_id") < N_QUERIES), "q_id"), "q_id"
    )
    cand = _unit(emb, "neighbor_id")
    scored = _scored_pairs(cand, q_ids, q_mat, local_k=TOP_K, threshold_e6=None)
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
    (label) are scored — per-cell scan instead of full scan."""
    emb = table(spark, sf_dir, "embeddings")
    qdf = _unit(emb.filter(F.col("vec_id") < N_QUERIES), "q_id", label=True).collect()
    import numpy as np

    q_ids = np.array([r["q_id"] for r in qdf], dtype="int64")
    q_mat = np.array([r["unit"] for r in qdf], dtype="float64")
    q_labels = np.array([r["label"] for r in qdf])
    cand = _unit(emb, "neighbor_id", label=True)
    scored = _scored_pairs(cand, q_ids, q_mat, local_k=3, threshold_e6=None, q_labels=q_labels)
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

    The corpus matrix rides in the closure (local-mode broadcast); each
    candidate batch does one matmul and emits only above-threshold pairs.
    At 100 TB the corpus no longer fits a broadcast — the scale path is the
    partitioned variant (intra-cell pairs) or MinHash-LSH bucketing from
    the dedup module feeding this verifier pairwise.
    """
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    ids, mat = _collect_matrix(_unit(emb, "vec_id"), "vec_id")
    cand = _unit(emb, "vec_a")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            c = np.array(list(pdf["unit"]), dtype="float64")
            a_ids = pdf["vec_a"].to_numpy()
            e6 = np.rint((c @ mat.T) * 1_000_000).astype("int64")
            hit = (e6 >= NEARDUP_E6) & (a_ids[:, None] < ids[None, :])
            ai, bj = np.nonzero(hit)
            yield pd.DataFrame(
                {"vec_a": a_ids[ai], "vec_b": ids[bj], "sim_e6": e6[ai, bj]}
            )

    ship_package(spark)
    return cand.mapInPandas(batches, schema="vec_a long, vec_b long, sim_e6 long")


_EMBEDDING_NEARDUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_SQL_SIM} AS sim_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_SQL_SIM} >= {NEARDUP_E6}
"""




def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with learned coarse centroids.

    Centroid training runs driver-side (numpy Lloyd iterations on a
    deterministic sample) — the standard IVF shape: training data fits one
    node even when the corpus is 100 TB, while cell ASSIGNMENT and probing
    stay fully distributed (one matmul per Arrow batch). Each query probes
    its nprobe=2 nearest cells. Training isn't SQL-expressible, so this
    query has no DuckDB oracle (driver records the rows-only check).
    """
    import numpy as np

    K, N_ITER, NPROBE = 16, 8, 2
    emb = table(spark, sf_dir, "embeddings")
    ids, mat = _collect_matrix(_unit(emb, "neighbor_id"), "neighbor_id")

    # deterministic sample + init: every 2nd vector, first K as seeds
    sample = mat[::2]
    centroids = sample[:K].copy()
    for _ in range(N_ITER):  # Lloyd's algorithm
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for k in range(K):
            members = sample[assign == k]
            if len(members):
                centroids[k] = members.mean(axis=0)

    # distributed cell assignment for the full corpus (broadcast centroids)
    def assign_cells(it):
        for pdf in it:
            if not len(pdf):
                continue
            c = np.array(list(pdf["unit"]), dtype="float64")
            d = ((c[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            out = pdf[["neighbor_id"]].copy()
            out["label"] = d.argmin(axis=1).astype("int64")
            yield out

    ship_package(spark)
    cand = _unit(emb, "neighbor_id")
    cells = cand.mapInPandas(assign_cells, schema="neighbor_id long, label long")
    cand_cells = cand.join(cells, "neighbor_id")

    q_rows = _unit(emb.filter(F.col("vec_id") < N_QUERIES), "q_id").toPandas()
    q_ids_l, q_mats, q_cells = [], [], []
    for _, r in q_rows.iterrows():
        qv = np.asarray(r["unit"], dtype="float64")
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:NPROBE]:
            q_ids_l.append(int(r["q_id"]))
            q_mats.append(qv)
            q_cells.append(int(cell))
    scored = _scored_pairs(
        cand_cells,
        np.array(q_ids_l, dtype="int64"),
        np.array(q_mats, dtype="float64"),
        local_k=TOP_K,
        threshold_e6=None,
        q_labels=np.array(q_cells, dtype="int64"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e6").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "sim_e6")
    )


REGISTRY = {
    "cosine_topk": QuerySpec(cosine_topk, _COSINE_TOPK_SQL, "ext:similarity"),
    "cosine_topk_partitioned": QuerySpec(
        cosine_topk_partitioned, _COSINE_TOPK_PART_SQL, "ext:similarity"
    ),
    "embedding_neardup": QuerySpec(embedding_neardup, _EMBEDDING_NEARDUP_SQL, "ext:similarity"),
    "ann_ivf": QuerySpec(ann_ivf, None, "ext:similarity scale path (no SQL oracle)"),
}
