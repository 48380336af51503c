"""Incrementally-maintained continuous aggregate: micro-batch merge
equals the batch aggregate of the full input, partition-pruned writes,
replay idempotence."""

from __future__ import annotations

import json
import os
import time as _time

from pyspark.sql import functions as F


def _write_batches(in_dir, batches):
    in_dir.mkdir()
    now = _time.time()
    for i, (name, lines) in enumerate(batches):
        p = in_dir / f"{name}.ndjson"
        p.write_text("\n".join(json.dumps(x) for x in lines))
        os.utime(p, (now - 120 + i * 60,) * 2)


def _rows():
    # three days of events, value carries 6-decimal precision
    out = []
    i = 0
    for day in (1, 2, 3):
        for hour in (0, 5, 23):
            for k in ("click", "view"):
                for _ in range(3):
                    i += 1
                    out.append(
                        {
                            "ts": f"2024-03-0{day} {hour:02d}:{i % 60:02d}:00",
                            "event_type": k,
                            "value": i + 0.125,
                        }
                    )
    return out


class TestContinuousAggregate:
    def test_microbatch_merge_equals_batch_aggregate(self, spark, tmp_path):
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        rows = _rows()
        in_dir = tmp_path / "landing"
        _write_batches(in_dir, [("b1", rows[:20]), ("b2", rows[20:40]), ("b3", rows[40:])])
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        cagg = ContinuousAggregate(str(tmp_path / "store"))
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(cagg.update_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        batch_df = spark.createDataFrame(
            [(r["ts"], r["event_type"], r["value"]) for r in rows],
            "ts string, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        want_hourly = {
            (str(r["bucket"]), r["key"]): (r["n"], str(r["sum_dec"]))
            for r in batch_df.groupBy(
                F.date_trunc("hour", "ts").alias("bucket"),
                F.col("event_type").alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(24,6)")).alias("sum_dec"),
            )
            .collect()
        }
        got_hourly = {
            (str(r["bucket"]), r["key"]): (r["n"], str(r["sum_dec"]))
            for r in cagg.hourly(spark).collect()
        }
        assert got_hourly == want_hourly  # exact, DECIMAL-for-DECIMAL

        # daily grain rolls from stored partials and matches daily-from-raw
        want_daily = {
            (str(r["bucket"]), r["key"]): (r["n"], str(r["sum_dec"]))
            for r in batch_df.groupBy(
                F.date_trunc("day", "ts").alias("bucket"),
                F.col("event_type").alias("key"),
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("value").cast("decimal(24,6)")).alias("sum_dec"),
            )
            .collect()
        }
        got_daily = {
            (str(r["bucket"]), r["key"]): (r["n"], str(r["sum_dec"]))
            for r in cagg.daily(spark).collect()
        }
        assert got_daily == want_daily

        # the store is day-partitioned (manifest-pruned merge reads)
        man = json.loads((tmp_path / "store" / "_cagg_manifest.json").read_text())
        assert len(man["days"]) == 3

    def test_replayed_batch_is_skipped(self, spark, tmp_path):
        """foreachBatch is at-least-once: re-delivering an already-merged
        batch_id must not double-count."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        df = spark.createDataFrame(
            [("2024-03-01 10:00:00", "click", 1.0)] * 5,
            "ts string, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        cagg = ContinuousAggregate(str(tmp_path / "store"))
        cagg.update_batch(df, batch_id=0)
        cagg.update_batch(df, batch_id=0)  # replay
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 5  # not 10
        cagg.update_batch(df, batch_id=1)  # a NEW batch does merge
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 10

    def test_merge_touches_only_affected_partitions(self, spark, tmp_path):
        """A batch for day 2 must leave day 1's partition files untouched
        (fresh generation dir + manifest-pruned read)."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        def df_for(day):
            return spark.createDataFrame(
                [(f"2024-03-0{day} 10:00:00", "click", 1.0)] * 3,
                "ts string, event_type string, value double",
            ).withColumn("ts", F.to_timestamp("ts"))

        cagg = ContinuousAggregate(str(tmp_path / "store"))
        cagg.update_batch(df_for(1), batch_id=0)
        d1 = tmp_path / "store" / "gen" / "0" / "day=2024-03-01"
        before = {p: os.path.getmtime(d1 / p) for p in os.listdir(d1) if p.endswith(".parquet")}
        _time.sleep(1.1)
        cagg.update_batch(df_for(2), batch_id=1)
        after = {p: os.path.getmtime(d1 / p) for p in os.listdir(d1) if p.endswith(".parquet")}
        assert before == after  # day 1 files untouched by a day-2 batch
        # and the manifest still points day 1 at its original generation
        man = json.loads((tmp_path / "store" / "_cagg_manifest.json").read_text())
        assert man["days"]["2024-03-01"] == 0 and man["days"]["2024-03-02"] == 1

    def test_crash_between_data_write_and_commit_is_exact_on_replay(
        self, spark, tmp_path, monkeypatch
    ):
        """The ADVICE crash window: data written, manifest NOT swapped.
        The replayed batch must re-merge from the PRE-batch state (no
        double count) and nothing previously committed may be lost."""
        from tomixpanel_spark.streaming import cagg as cagg_mod

        def df_for(n):
            return spark.createDataFrame(
                [("2024-03-01 10:00:00", "click", 1.0)] * n,
                "ts string, event_type string, value double",
            ).withColumn("ts", F.to_timestamp("ts"))

        cagg = cagg_mod.ContinuousAggregate(str(tmp_path / "store"))
        cagg.update_batch(df_for(5), batch_id=0)

        real_commit = cagg._commit_manifest
        calls = []

        def crash_once(man):
            if not calls:
                calls.append(1)
                raise OSError("simulated crash before manifest swap")
            real_commit(man)

        monkeypatch.setattr(cagg, "_commit_manifest", crash_once)
        import pytest as _pytest

        with _pytest.raises(OSError, match="simulated crash"):
            cagg.update_batch(df_for(3), batch_id=1)  # data lands, commit dies
        # store still reads the committed state only
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 5
        cagg.update_batch(df_for(3), batch_id=1)  # at-least-once replay
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 8  # exactly once despite the half-commit

    def test_null_timestamp_rows_dropped_not_poisonous(self, spark, tmp_path):
        """A row whose ts fails parsing must not crash the batch (and with
        at-least-once redelivery, crash it forever) — null-ts rows are
        dropped explicitly; the bucketable rows still merge."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        df = spark.createDataFrame(
            [("2024-03-01 10:00:00", "click", 1.0), (None, "click", 1.0)],
            "ts string, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        cagg = ContinuousAggregate(str(tmp_path / "store"))
        cagg.update_batch(df, batch_id=0)
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 1

    def test_adopts_pre_manifest_store_without_data_loss(self, spark, tmp_path):
        """Upgrading over a store written by the earlier format (day=*
        dirs at the root + _cagg_meta.json) must keep its aggregates AND
        its applied batch_id — not silently read an empty store and
        double-merge the redelivered batch."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        store = tmp_path / "store"

        def df_for(n, day=1):
            return spark.createDataFrame(
                [(f"2024-03-0{day} 10:00:00", "click", 1.0)] * n,
                "ts string, event_type string, value double",
            ).withColumn("ts", F.to_timestamp("ts"))

        # simulate the legacy layout: day-partitioned parquet at the root
        # plus the separate batch_id meta file
        legacy = ContinuousAggregate(str(store))
        partials = legacy._batch_partials(df_for(5))
        partials.write.mode("overwrite").partitionBy("day").parquet(str(store))
        (store / "_cagg_meta.json").write_text(json.dumps({"batch_id": 3}))

        cagg = ContinuousAggregate(str(store))
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 5  # adopted, not empty
        cagg.update_batch(df_for(2), batch_id=3)  # replay of applied batch
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 5  # skipped via adopted batch_id
        cagg.update_batch(df_for(2), batch_id=4)  # genuinely new batch
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 7
        # day 2 written later must not disturb the adopted day-1 data
        cagg.update_batch(df_for(3, day=2), batch_id=5)
        got = {str(r["bucket"])[:10]: r["n"] for r in cagg.hourly(spark).collect()}
        assert got == {"2024-03-01": 7, "2024-03-02": 3}


class TestManifestDurability:
    def test_corrupt_manifest_raises_instead_of_silent_reset(
        self, spark, tmp_path
    ):
        """An existing-but-unparseable manifest must raise loudly. The old
        behavior fell back to the legacy prober, which on a new-format
        store (data under gen/, nothing at the root) returned an EMPTY
        manifest — hourly() read nothing and a replayed batch re-merged
        from scratch: silent loss/double-count (round-7 advice)."""
        import pytest

        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        def df_for(n):
            return spark.createDataFrame(
                [("2024-03-01 10:00:00", "click", 1.0)] * n,
                "ts string, event_type string, value double",
            ).withColumn("ts", F.to_timestamp("ts"))

        cagg = ContinuousAggregate(str(tmp_path / "store"))
        cagg.update_batch(df_for(5), batch_id=0)
        man_path = tmp_path / "store" / "_cagg_manifest.json"
        man_path.write_text("{truncated-by-crash")
        with pytest.raises(RuntimeError, match="corrupt cagg manifest"):
            cagg.hourly(spark)
        with pytest.raises(RuntimeError, match="corrupt cagg manifest"):
            cagg.update_batch(df_for(1), batch_id=1)
        # recovery instruction in the error works: rebuild from gen dirs
        man_path.write_text(
            json.dumps({"batch_id": 0, "days": {"2024-03-01": 0}})
        )
        [row] = cagg.hourly(spark).collect()
        assert row["n"] == 5

    def test_gc_grace_retains_newest_superseded_generations(self, spark, tmp_path):
        """Default gc keeps the gc_keep newest superseded generations so a
        lazy reader resolved against a recent manifest survives the next
        commits; older ones are removed; gc_keep=0 restores immediate gc."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        def df_for(n):
            return spark.createDataFrame(
                [("2024-03-01 10:00:00", "click", 1.0)] * n,
                "ts string, event_type string, value double",
            ).withColumn("ts", F.to_timestamp("ts"))

        store = tmp_path / "store"
        cagg = ContinuousAggregate(str(store), gc_keep=2)
        # a lazy reader resolved against the generation-0 manifest
        cagg.update_batch(df_for(1), batch_id=0)
        held = cagg.hourly(spark)
        for b in (1, 2):
            cagg.update_batch(df_for(1), batch_id=b)
        gens = set(os.listdir(store / "gen"))
        # gen 2 is live; 0 and 1 are superseded but inside the grace window
        assert gens == {"0", "1", "2"}
        # the held reader still works: its files were not deleted
        [row] = held.collect()
        assert row["n"] == 1
        cagg.update_batch(df_for(1), batch_id=3)
        gens = set(os.listdir(store / "gen"))
        assert "0" not in gens and {"2", "3"} <= gens  # oldest aged out

        immediate = ContinuousAggregate(str(tmp_path / "s2"), gc_keep=0)
        for b in (0, 1):
            immediate.update_batch(df_for(1), batch_id=b)
        assert set(os.listdir(tmp_path / "s2" / "gen")) == {"1"}


class TestDriverMergeGate:
    """Size-adaptive merge: under TOMIX_CAGG_DRIVER_MERGE_CAP the store
    merge runs driver-side (pandas/Decimal + pyarrow writes); above it,
    or at cap=0, the distributed path runs. Both must produce
    bit-identical stores, including across MIXED generations (a spark-
    written day later merged by the driver writer and vice versa).
    Path witness: the Spark writer leaves a _SUCCESS marker in the
    generation dir, the pyarrow writer does not."""

    def _batches(self, spark):
        def df(rows):
            return spark.createDataFrame(
                rows, "ts string, event_type string, value double"
            ).withColumn("ts", F.to_timestamp("ts"))

        b0 = df(
            [("2024-03-01 10:00:00", "click", 1.5)] * 3
            + [("2024-03-01 11:00:00", None, 2.25)]  # null key survives
            + [("2024-03-02 09:00:00", "view", 0.125)]
        )
        b1 = df(
            [("2024-03-01 10:00:00", "click", 4.0)] * 2
            + [(None, "poison", 9.9), ("2024-03-03 23:00:00", "view", 7.75)]
        )
        return [b0, b1]

    def _hourly_map(self, spark, cagg):
        return {
            (str(r["bucket"]), r["key"]): (r["n"], str(r["sum_dec"]))
            for r in cagg.hourly(spark).collect()
        }

    def test_driver_and_spark_paths_bit_identical(self, spark, tmp_path, monkeypatch):
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        monkeypatch.delenv("TOMIX_CAGG_DRIVER_MERGE_CAP", raising=False)
        drv = ContinuousAggregate(str(tmp_path / "drv"))
        for i, b in enumerate(self._batches(spark)):
            drv.update_batch(b, i)
        monkeypatch.setenv("TOMIX_CAGG_DRIVER_MERGE_CAP", "0")
        spk = ContinuousAggregate(str(tmp_path / "spk"))
        for i, b in enumerate(self._batches(spark)):
            spk.update_batch(b, i)
        got_d = self._hourly_map(spark, drv)
        got_s = self._hourly_map(spark, spk)
        assert got_d == got_s and len(got_d) == 4
        # schemas of both stores agree (union-compatible generations)
        assert (
            drv.hourly(spark).schema.simpleString()
            == spk.hourly(spark).schema.simpleString()
        )
        # path witness: driver generations carry no Spark _SUCCESS marker
        assert not os.path.exists(tmp_path / "drv" / "gen" / "1" / "_SUCCESS")
        assert os.path.exists(tmp_path / "spk" / "gen" / "1" / "_SUCCESS")

    def test_mixed_generations_merge_exactly(self, spark, tmp_path, monkeypatch):
        """Batch 0 through the DISTRIBUTED writer, batch 1 (same day)
        through the DRIVER writer: the driver merge must read the
        spark-written generation and the final store must equal an
        all-driver store."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        b0, b1 = self._batches(spark)
        mixed = ContinuousAggregate(str(tmp_path / "mixed"))
        monkeypatch.setenv("TOMIX_CAGG_DRIVER_MERGE_CAP", "0")
        mixed.update_batch(b0, 0)
        monkeypatch.setenv("TOMIX_CAGG_DRIVER_MERGE_CAP", "65536")
        mixed.update_batch(b1, 1)
        monkeypatch.delenv("TOMIX_CAGG_DRIVER_MERGE_CAP")
        ref = ContinuousAggregate(str(tmp_path / "ref"))
        ref.update_batch(b0, 0)
        ref.update_batch(b1, 1)
        assert self._hourly_map(spark, mixed) == self._hourly_map(spark, ref)

    def test_overflow_falls_back_to_distributed(self, spark, tmp_path, monkeypatch):
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        b0, _ = self._batches(spark)
        monkeypatch.setenv("TOMIX_CAGG_DRIVER_MERGE_CAP", "1")  # 4 cells > 1
        cagg = ContinuousAggregate(str(tmp_path / "store"))
        cagg.update_batch(b0, 0)
        assert os.path.exists(tmp_path / "store" / "gen" / "0" / "_SUCCESS")
        assert len(self._hourly_map(spark, cagg)) == 3

    def test_non_string_key_type_stays_distributed(self, spark, tmp_path, monkeypatch):
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        monkeypatch.delenv("TOMIX_CAGG_DRIVER_MERGE_CAP", raising=False)
        df = spark.createDataFrame(
            [("2024-03-01 10:00:00", 7, 1.5)], "ts string, k long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        cagg = ContinuousAggregate(
            str(tmp_path / "store"), key_col="k", key_type="bigint"
        )
        cagg.update_batch(df, 0)
        assert os.path.exists(tmp_path / "store" / "gen" / "0" / "_SUCCESS")
        [r] = cagg.hourly(spark).collect()
        assert r["key"] == 7 and r["n"] == 1


class TestAllNullCell:
    def test_all_null_value_cell_merges_as_null_not_typeerror(self, spark, tmp_path):
        """A (bucket, key) cell whose values are ALL null: F.sum yields
        NULL; the driver-side merge must match (and not raise TypeError —
        in foreachBatch that would redeliver the batch forever)."""
        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        def df(rows):
            return spark.createDataFrame(
                rows, "ts string, event_type string, value double"
            ).withColumn("ts", F.to_timestamp("ts"))

        for cap, name in ((None, "drv"), ("0", "spk")):
            if cap is not None:
                os.environ["TOMIX_CAGG_DRIVER_MERGE_CAP"] = cap
            try:
                cagg = ContinuousAggregate(str(tmp_path / name))
                cagg.update_batch(
                    df([("2024-03-01 05:00:00", "click", None),
                        ("2024-03-01 05:10:00", "click", None),
                        ("2024-03-01 05:20:00", "view", 1.5)]), 0)
                # second batch merges MORE nulls into the existing null cell
                cagg.update_batch(
                    df([("2024-03-01 05:30:00", "click", None)]), 1)
            finally:
                os.environ.pop("TOMIX_CAGG_DRIVER_MERGE_CAP", None)
            got = {
                r["key"]: (r["n"], r["sum_dec"])
                for r in cagg.hourly(spark).collect()
            }
            assert got["click"][0] == 3 and got["click"][1] is None, (name, got)
            assert got["view"][0] == 1 and str(got["view"][1]) == "1.500000", name

    def test_hourly_cache_survives_store_recreation(self, spark, tmp_path):
        """Round-10 advice: the hourly() plan cache was keyed on the
        days->gen map alone — a store deleted and recreated at the same
        path restarts batch ids at 0, so an identical map could serve
        the DEAD store's plan. The recreated store must serve ITS OWN
        values."""
        import shutil

        from tomixpanel_spark.streaming.cagg import ContinuousAggregate

        store = str(tmp_path / "store")

        def batch(val):
            return spark.createDataFrame(
                [("2024-03-01 05:00:00", "click", val)],
                "ts string, event_type string, value double",
            ).withColumn("ts", F.to_timestamp("ts"))

        c1 = ContinuousAggregate(store)
        c1.update_batch(batch(1.0), 0)
        first = c1.hourly(spark).collect()  # fills the plan cache
        assert [(r["n"], str(r["sum_dec"])) for r in first] == [(1, "1.000000")]
        shutil.rmtree(store)
        c2 = ContinuousAggregate(store)
        c2.update_batch(batch(7.0), 0)  # same day, same batch id: key clash
        out = c2.hourly(spark).collect()
        assert [(r["n"], str(r["sum_dec"])) for r in out] == [(1, "7.000000")]
