"""Persistent cross-run exact-duplicate index (incremental crawl dedup).

A training-data pipeline rarely sees its corpus once: every crawl/refresh
lands a new batch that must be checked against EVERYTHING already
ingested. Re-running corpus-wide dedup per batch is O(corpus) every time;
this module maintains a persisted index of content hashes so each new
batch costs O(batch + touched index partitions):

  * the index stores one row per distinct content hash (60-bit md5
    prefix, a fixed-width long — the join/shuffle key is 8 bytes, never
    the text) plus the first-seen doc id and batch;
  * rows are partitioned by hash prefix (``b = h mod n_buckets``): a
    batch reads and rewrites ONLY the bucket partitions its hashes land
    in, so per-batch IO is proportional to the batch, not the index —
    the same manifest-pruned generation protocol as
    ``streaming/cagg.py`` (fresh ``gen/<batch_id>/b=<k>/`` dirs, one
    atomic ``os.replace`` manifest swap, replayed batches short-circuit
    on the recorded batch_id, superseded generations gc with a grace
    window);
  * ``register`` is ``foreachBatch``-shaped (df, batch_id) so a
    Structured Streaming ingest maintains the index exactly-once;
  * ``probe`` answers "seen before?" per incoming document via a join
    against only the touched buckets.

Size-adaptive merge (the cagg/tfidf gate pattern): the batch side always
hashes and de-duplicates Spark-side (scales with the batch), but the
result is one row per DISTINCT batch hash. Under
``TOMIX_DEDUP_INDEX_DRIVER_CAP`` (default 65536 hashes; 0 disables) the
store merge runs driver-side with pyarrow reads/writes — replacing the
per-batch Spark job train whose fixed floors dominate small-batch cost.
Above the cap the merge stays fully distributed.

At 100 TB: ``n_buckets`` sizes the unit of rewrite IO (buckets ~ index
size / target partition size); the hot path is a long-keyed hash join
between a batch and its touched buckets, map-side-combinable and
skew-free because md5 prefixes are uniform.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class DedupIndex:
    """Content-hash index: ``register`` merges a batch's new hashes,
    ``probe`` flags already-seen documents. ``path`` must be
    driver-accessible (same contract as ``ContinuousAggregate``)."""

    SCHEMA = "h long, first_doc_id long, first_batch long"

    def __init__(
        self,
        path: str,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        gc: bool = True,
        gc_keep: int = 2,
    ) -> None:
        self.path = path
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.text_col = text_col
        self.gc = gc
        self.gc_keep = gc_keep

    # -- hashing ----------------------------------------------------------
    def _hash_col(self):
        """60-bit md5 prefix as a long — the same canonical content hash
        as the dedup family (dedup.py), identical in any engine that can
        md5 UTF-8 text, so index behavior stays oracle-checkable."""
        return F.conv(
            F.substring(F.md5(F.col(self.text_col)), 1, 15), 16, 10
        ).cast("long")

    def _batch_hashes(self, df: DataFrame) -> DataFrame:
        """One row per distinct batch hash with its keep-first doc id
        (min over the batch — deterministic) and bucket."""
        return (
            df.select(F.col(self.id_col).alias("doc_id"), self._hash_col().alias("h"))
            .filter(F.col("h").isNotNull())
            .groupBy("h")
            .agg(F.min("doc_id").alias("first_doc_id"))
            .withColumn("b", F.pmod("h", F.lit(self.n_buckets)).cast("int"))
        )

    # -- manifest (cagg protocol: bucket -> generation + batch_id) --------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_dedup_index_manifest.json")

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                raw = f.read()
        except FileNotFoundError:
            return {"batch_id": -1, "buckets": {}}
        try:
            man = json.loads(raw)
            return {"batch_id": man["batch_id"], "buckets": dict(man["buckets"])}
        except (ValueError, KeyError, TypeError) as exc:
            raise RuntimeError(
                f"corrupt dedup-index manifest at {self._manifest_path()}: "
                f"{exc}; recover from the gen/<batch_id>/b=* directories — "
                "the data files are intact, do NOT delete the store"
            ) from exc

    def _commit_manifest(self, man: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path())

    def _gen_dir(self, gen) -> str:
        return os.path.join(self.path, "gen", str(gen))

    def _gc_superseded(self, man: dict) -> None:
        if not self.gc:
            return
        live = {str(g) for g in man["buckets"].values()}
        root = os.path.join(self.path, "gen")
        try:
            gens = os.listdir(root)
        except OSError:
            return
        superseded = sorted(
            (g for g in gens if g not in live and g.lstrip("-").isdigit()), key=int
        )
        for g in superseded[: max(0, len(superseded) - self.gc_keep)]:
            shutil.rmtree(os.path.join(root, g), ignore_errors=True)

    def _read_buckets(self, spark: SparkSession, man: dict, buckets) -> DataFrame | None:
        by_gen: dict[str, list[str]] = {}
        for b in buckets:
            g = man["buckets"].get(str(b))
            if g is not None:
                by_gen.setdefault(str(g), []).append(str(b))
        parts = []
        for g, bs in by_gen.items():
            base = self._gen_dir(g)
            paths = [os.path.join(base, f"b={b}") for b in bs]
            parts.append(spark.read.option("basePath", base).parquet(*paths))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- write path -------------------------------------------------------
    def register(self, batch_df: DataFrame, batch_id: int) -> None:
        """Merge one batch's distinct content hashes into the index
        (first-writer-wins: a hash already present keeps its original
        first_doc_id/first_batch). ``foreachBatch``-shaped and replay-
        idempotent via the manifest batch_id."""
        man = self._load_manifest()
        if batch_id <= man["batch_id"]:
            return  # replayed batch: already committed
        spark = batch_df.sparkSession
        cap = int(os.environ.get("TOMIX_DEDUP_INDEX_DRIVER_CAP", "65536"))
        hashes = self._batch_hashes(batch_df)
        pdf = None
        if cap > 0:
            pdf = hashes.limit(cap + 1).toPandas()
        if pdf is not None and len(pdf) <= cap:
            buckets = self._merge_driver_write(pdf, man, batch_id)
        else:
            buckets = self._merge_spark_write(spark, hashes, man, batch_id)
        new_man = {
            "batch_id": batch_id,
            "buckets": {**man["buckets"], **{str(b): batch_id for b in buckets}},
        }
        self._commit_manifest(new_man)
        self._gc_superseded(new_man)

    def _merge_spark_write(
        self, spark: SparkSession, hashes: DataFrame, man: dict, batch_id: int
    ) -> list:
        """Distributed merge (the scale path): union existing touched
        buckets with the batch rows, keep the FIRST writer per hash
        (min struct — existing rows carry the smaller batch id, so they
        win), write fresh bucket partitions under this generation."""
        hashes = hashes.persist()
        try:
            buckets = sorted(
                r["b"] for r in hashes.select("b").distinct().collect()
            )
            batch_rows = hashes.select(
                "h",
                "first_doc_id",
                F.lit(batch_id).cast("long").alias("first_batch"),
                "b",
            )
            existing = self._read_buckets(spark, man, buckets)
            merged = batch_rows
            if existing is not None:
                merged = (
                    existing.withColumn("b", F.col("b").cast("int"))
                    .unionByName(batch_rows)
                    .groupBy("h")
                    .agg(
                        F.min(
                            F.struct("first_batch", "first_doc_id", "b")
                        ).alias("w")
                    )
                    .select(
                        "h",
                        F.col("w.first_doc_id").alias("first_doc_id"),
                        F.col("w.first_batch").alias("first_batch"),
                        F.col("w.b").alias("b"),
                    )
                )
            merged.coalesce(1).write.mode("overwrite").partitionBy("b").parquet(
                self._gen_dir(batch_id)
            )
        finally:
            hashes.unpersist()
        return buckets

    def _merge_driver_write(self, pdf, man: dict, batch_id: int) -> list:
        """Driver-side merge for batches under the gate: set-difference
        on int64 hash arrays + direct parquet writes, same layout as the
        Spark writer."""
        import glob

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        gen = self._gen_dir(batch_id)
        shutil.rmtree(gen, ignore_errors=True)  # replayed orphan overwrite
        if not len(pdf):
            return []
        buckets = sorted(int(b) for b in pdf["b"].unique())
        for b in buckets:
            sub = pdf[pdf["b"] == b][["h", "first_doc_id"]].copy()
            sub["first_batch"] = batch_id
            frames = [sub]
            g = man["buckets"].get(str(b))
            if g is not None:
                bdir = os.path.join(self._gen_dir(g), f"b={b}")
                for f in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
                    frames.append(
                        pq.read_table(f).to_pandas()[
                            ["h", "first_doc_id", "first_batch"]
                        ]
                    )
            allb = pd.concat(frames, ignore_index=True)
            # first-writer-wins: sort by (first_batch, first_doc_id) and
            # keep the first row per hash — existing rows (smaller batch)
            # beat the incoming batch, mirroring the Spark min-struct
            allb = (
                allb.sort_values(["first_batch", "first_doc_id"], kind="stable")
                .drop_duplicates("h", keep="first")
                .sort_values("h")
            )
            tbl = pa.Table.from_arrays(
                [
                    pa.array(allb["h"].astype("int64"), type=pa.int64()),
                    pa.array(allb["first_doc_id"].astype("int64"), type=pa.int64()),
                    pa.array(allb["first_batch"].astype("int64"), type=pa.int64()),
                ],
                names=["h", "first_doc_id", "first_batch"],
            )
            bdir = os.path.join(gen, f"b={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(tbl, os.path.join(bdir, "part-00000.parquet"))
        return buckets

    # -- read paths -------------------------------------------------------
    def entries(self, spark: SparkSession) -> DataFrame:
        """Every indexed hash with its first-seen doc/batch."""
        man = self._load_manifest()
        df = self._read_buckets(spark, man, sorted(man["buckets"], key=int))
        if df is None:
            return spark.createDataFrame([], StructType.fromDDL(self.SCHEMA))
        return df.select("h", "first_doc_id", "first_batch")

    def drop_seen(self, df: DataFrame) -> DataFrame:
        """The filter verb pipelines actually want: input rows whose
        content hash is NOT yet indexed (probe + filter; original
        columns only). Register the survivors afterwards to claim them."""
        flagged = self.probe(df)
        return flagged.filter(~F.col("seen_before")).drop(
            "seen_before", "first_doc_id"
        )

    def probe(self, df: DataFrame) -> DataFrame:
        """Input rows + ``seen_before`` (hash present in the index) and
        ``first_doc_id`` (the keeper it duplicates, null when unseen).
        Reads ONLY the bucket partitions the probe's hashes touch."""
        spark = df.sparkSession
        man = self._load_manifest()
        probes = df.withColumn("_h", self._hash_col())
        touched = sorted(
            r["b"]
            for r in probes.select(
                F.pmod("_h", F.lit(self.n_buckets)).cast("int").alias("b")
            )
            .distinct()
            .collect()
            if r["b"] is not None
        )
        idx = self._read_buckets(spark, man, touched)
        if idx is None:
            return probes.select(
                df["*"],
                F.lit(False).alias("seen_before"),
                F.lit(None).cast("long").alias("first_doc_id"),
            )
        idx = idx.select("h", "first_doc_id")
        joined = probes.join(idx, probes["_h"] == idx["h"], "left")
        return joined.select(
            df["*"],
            idx["h"].isNotNull().alias("seen_before"),
            idx["first_doc_id"].alias("first_doc_id"),
        )
