"""Persistent cross-run dedup index: probe correctness, first-writer
keeper stability, replay idempotence, bucket-pruned rewrites, and
driver/distributed merge parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedupIndex:
    def test_probe_flags_cross_run_duplicates(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"))
        idx.register(_docs(spark, [(0, "alpha"), (2, "beta"), (4, "alpha")]), 0)
        out = {
            r["doc_id"]: (r["seen_before"], r["first_doc_id"])
            for r in idx.probe(
                _docs(spark, [(1, "alpha"), (3, "gamma"), (5, "beta")])
            ).collect()
        }
        # keeper is the MIN registered doc id for the hash
        assert out == {1: (True, 0), 3: (False, None), 5: (True, 2)}

    def test_incremental_growth_and_first_writer_wins(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"))
        idx.register(_docs(spark, [(10, "alpha")]), 0)
        # batch 1 re-offers "alpha" under a smaller doc id — the ORIGINAL
        # first-seen row must survive (first-writer-wins, not min-overall)
        idx.register(_docs(spark, [(1, "alpha"), (11, "delta")]), 1)
        entries = {
            r["first_doc_id"]: r["first_batch"]
            for r in idx.entries(spark).collect()
        }
        assert entries == {10: 0, 11: 1}

    def test_first_writer_survives_new_run_namespace(self, spark, tmp_path):
        """Batch ids restart at 0 per run: a second crawl re-offering an
        indexed hash at a SMALLER batch id must not steal the keeper —
        precedence is came-from-store, not batch-id order. Both merge
        paths (driver-fold and distributed) must agree."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        for cap, name in ((None, "drv"), ("0", "spk")):
            store = str(tmp_path / name)
            if cap is not None:
                os.environ["TOMIX_DEDUP_INDEX_DRIVER_CAP"] = cap
            try:
                DedupIndex(store, run="crawl-a").register(
                    _docs(spark, [(10, "alpha")]), 0
                )
                # new run: batch id 0 again, smaller doc id — must lose
                DedupIndex(store, run="crawl-b").register(
                    _docs(spark, [(1, "alpha"), (11, "delta")]), 0
                )
            finally:
                os.environ.pop("TOMIX_DEDUP_INDEX_DRIVER_CAP", None)
            entries = {
                r["first_doc_id"]: r["first_batch"]
                for r in DedupIndex(store).entries(spark).collect()
            }
            assert entries == {10: 0, 11: 0}, (name, entries)

    def test_replayed_batch_is_skipped(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"))
        idx.register(_docs(spark, [(1, "alpha")]), 0)
        before = idx.entries(spark).collect()
        idx.register(_docs(spark, [(99, "other")]), 0)  # replay of batch 0
        assert idx.entries(spark).collect() == before

    def test_rewrites_touch_only_probed_buckets(self, spark, tmp_path):
        """A batch landing in other buckets must leave an untouched
        bucket's files alone (manifest-pruned generations)."""
        import time as _time

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(1, "alpha"), (2, "beta"), (3, "gamma")]), 0)
        gen0 = tmp_path / "store" / "gen" / "0"
        bucket_dirs = sorted(p for p in os.listdir(gen0) if p.startswith("b="))
        assert bucket_dirs  # at least one bucket written
        probe_dir = gen0 / bucket_dirs[0]
        before = {
            p: os.path.getmtime(probe_dir / p)
            for p in os.listdir(probe_dir)
            if p.endswith(".parquet")
        }
        _time.sleep(1.1)
        # find a text whose hash lands in a DIFFERENT bucket
        target = int(bucket_dirs[0][2:])
        cand = None
        for i in range(50):
            t = f"probe-text-{i}"
            b = _docs(spark, [(0, t)]).select(
                F.pmod(
                    F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long"),
                    F.lit(4),
                ).alias("b")
            ).collect()[0]["b"]
            if b != target:
                cand = t
                break
        idx.register(_docs(spark, [(9, cand)]), 1)
        after = {
            p: os.path.getmtime(probe_dir / p)
            for p in os.listdir(probe_dir)
            if p.endswith(".parquet")
        }
        assert before == after

    def test_driver_and_spark_merge_paths_identical(self, spark, tmp_path, monkeypatch):
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        batches = [
            _docs(spark, [(4, "alpha"), (2, "beta"), (6, "alpha")]),
            _docs(spark, [(1, "alpha"), (3, "gamma")]),
        ]
        monkeypatch.delenv("TOMIX_DEDUP_INDEX_DRIVER_CAP", raising=False)
        drv = DedupIndex(str(tmp_path / "drv"))
        for i, b in enumerate(batches):
            drv.register(b, i)
        monkeypatch.setenv("TOMIX_DEDUP_INDEX_DRIVER_CAP", "0")
        spk = DedupIndex(str(tmp_path / "spk"))
        for i, b in enumerate(batches):
            spk.register(b, i)

        def snap(ix):
            return sorted(tuple(r) for r in ix.entries(spark).collect())

        assert snap(drv) == snap(spk)
        # path witness: the Spark writer leaves a _SUCCESS marker
        assert os.path.exists(tmp_path / "spk" / "gen" / "1" / "_SUCCESS")
        assert not os.path.exists(tmp_path / "drv" / "gen" / "1" / "_SUCCESS")

    def test_crash_before_commit_replays_exactly(self, spark, tmp_path, monkeypatch):
        """Generation written, manifest swap crashed: the replayed batch
        must re-merge from the pre-batch state with no double count."""
        from tomixpanel_spark.streaming import dedup_index as mod

        idx = mod.DedupIndex(str(tmp_path / "store"))
        idx.register(_docs(spark, [(1, "alpha")]), 0)

        real_swap = mod.atomic_json_swap

        def boom(path, obj):
            raise RuntimeError("crash before manifest swap")

        monkeypatch.setattr(mod, "atomic_json_swap", boom)
        try:
            idx.register(_docs(spark, [(2, "beta")]), 1)
        except RuntimeError:
            pass
        monkeypatch.setattr(mod, "atomic_json_swap", real_swap)
        # store still at batch 0; replay merges exactly once
        idx.register(_docs(spark, [(2, "beta")]), 1)
        got = sorted(tuple(r) for r in idx.entries(spark).collect())
        hashes = {h for h, _, _ in got}
        assert len(got) == 2 and len(hashes) == 2
        assert {(d, b) for _, d, b in got} == {(1, 0), (2, 1)}

    def test_foreachbatch_stream_maintains_index(self, spark, tmp_path):
        import json as _json
        import time as _time

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        in_dir = tmp_path / "landing"
        in_dir.mkdir()
        now = _time.time()
        for i, rows in enumerate(
            [[(1, "alpha"), (2, "beta")], [(3, "alpha"), (4, "gamma")]]
        ):
            p = in_dir / f"b{i}.ndjson"
            p.write_text(
                "\n".join(
                    _json.dumps({"doc_id": d, "text": t}) for d, t in rows
                )
            )
            os.utime(p, (now - 60 + i * 30,) * 2)
        idx = DedupIndex(str(tmp_path / "store"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(idx.register)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ent = sorted(tuple(r) for r in idx.entries(spark).collect())
        # 3 distinct texts; "alpha" keeps its first-seen doc
        assert len(ent) == 3
        assert {(d, b) for _, d, b in ent} >= {(1, 0)}

    def test_probe_reads_only_touched_buckets(self, spark, tmp_path):
        """Scale guard: the probe plan's input files must come only from
        the bucket partitions the probe's hashes land in — reading the
        whole index per probe would be O(corpus) at every batch."""
        from pyspark.sql import functions as F

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=8)
        seed = [(i, f"text-{i}") for i in range(64)]  # spans all buckets
        idx.register(_docs(spark, seed), 0)
        probe_df = _docs(spark, [(100, "text-3")])
        [b] = (
            probe_df.select(
                F.pmod(
                    F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long"),
                    F.lit(8),
                ).alias("b")
            )
            .collect()
        )
        out = idx.probe(probe_df)
        files = out.inputFiles()
        bucket_files = [f for f in files if "/b=" in f]
        assert bucket_files, "probe read no bucket partitions"
        assert all(f"/b={b['b']}/" in f for f in bucket_files), bucket_files

    def test_drop_seen_filters_and_preserves_columns(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"))
        idx.register(_docs(spark, [(0, "alpha")]), 0)
        out = idx.drop_seen(_docs(spark, [(1, "alpha"), (2, "gamma")]))
        assert out.columns == ["doc_id", "text"]
        assert [r["doc_id"] for r in out.collect()] == [2]


class TestDedupIndexProperties:
    """Property: registering any partition of a document set batch-by-
    batch indexes exactly the distinct hash set, with a first-writer
    keeper per hash (min doc id of the EARLIEST batch containing it)."""

    def test_sequential_equals_set_semantics(self, spark, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        texts = st.sampled_from(["a", "b", "c", "dd", "ee"])
        batches_strategy = st.lists(
            st.lists(texts, min_size=1, max_size=5), min_size=1, max_size=3
        )
        counter = {"i": 0}

        @given(batches_strategy)
        @settings(max_examples=8, deadline=None)
        def check(batches):
            counter["i"] += 1
            idx = DedupIndex(
                str(tmp_path / f"store{counter['i']}"), n_buckets=4
            )
            expect: dict[str, tuple[int, int]] = {}
            doc = 0
            for bi, batch in enumerate(batches):
                rows = []
                for t in batch:
                    rows.append((doc, t))
                    if t not in expect:
                        expect[t] = (doc, bi)
                    elif expect[t][1] == bi:
                        expect[t] = (min(expect[t][0], doc), bi)
                    doc += 1
                idx.register(_docs(spark, rows), bi)
            got = {
                (r["first_doc_id"], r["first_batch"])
                for r in idx.entries(spark).collect()
            }
            assert got == set(expect.values())

        check()


class TestProbeDriverParity:
    def test_probe_driver_equals_distributed_probe(self, spark, tmp_path):
        """probe_driver (pyarrow bucket reads + pandas merge) must equal
        the distributed probe row-for-row, including unseen-null keepers."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha"), (2, "beta"), (4, "alpha")]), 0)
        probe = _docs(spark, [(1, "alpha"), (3, "gamma"), (5, "beta")])
        dist = sorted(
            (r["doc_id"], r["seen_before"], r["first_doc_id"])
            for r in idx.probe(probe).collect()
        )
        drv_pdf = idx.probe_driver(probe.toPandas())
        drv = sorted(
            (int(r.doc_id), bool(r.seen_before),
             None if r.first_doc_id is None else int(r.first_doc_id))
            for r in drv_pdf.itertuples(index=False)
        )
        assert drv == dist and len(drv) == 3

    def test_probe_driver_null_text_matches_distributed(self, spark, tmp_path):
        """Null text must probe as unseen on BOTH paths (round-9 advice:
        an object-dtype hash column made the pandas merge raise where the
        distributed probe degraded gracefully)."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha"), (2, "beta")]), 0)
        probe = _docs(spark, [(1, "alpha"), (3, None), (5, None), (7, "new")])
        dist = sorted(
            (r["doc_id"], r["seen_before"], r["first_doc_id"])
            for r in idx.probe(probe).collect()
        )
        drv_pdf = idx.probe_driver(probe.toPandas())
        drv = sorted(
            (int(r.doc_id), bool(r.seen_before),
             None if r.first_doc_id is None or r.first_doc_id != r.first_doc_id
             else int(r.first_doc_id))
            for r in drv_pdf.itertuples(index=False)
        )
        assert drv == dist and len(drv) == 4
        assert (3, False, None) in drv and (5, False, None) in drv

    def test_probe_driver_all_null_batch(self, spark, tmp_path):
        """A batch of ONLY null text must not raise and reads no buckets."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha")]), 0)
        drv_pdf = idx.probe_driver(_docs(spark, [(1, None), (2, None)]).toPandas())
        assert list(drv_pdf["seen_before"]) == [False, False]
        assert all(v is None or v != v for v in drv_pdf["first_doc_id"])


class TestRebucket:
    def test_rebucket_round_trips_entries_and_probes(self, spark, tmp_path):
        """Grow 4->7 then shrink 7->3: entries identical bit-for-bit,
        probes identical, and the manifest adopts the new layout (a
        reopen with a stale constructor count still routes correctly)."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha"), (2, "beta"), (4, "alpha")]), 0)
        idx.register(_docs(spark, [(6, "gamma"), (8, "beta")]), 1)
        before = sorted(tuple(r) for r in idx.entries(spark).collect())
        probe = _docs(spark, [(1, "alpha"), (3, "delta"), (5, "gamma")])
        probe_before = sorted(tuple(r) for r in idx.probe(probe).collect())

        for nb in (7, 3):
            idx.rebucket(spark, nb)
            assert sorted(tuple(r) for r in idx.entries(spark).collect()) == before
            assert (
                sorted(tuple(r) for r in idx.probe(probe).collect())
                == probe_before
            )
            # stale-constructor reopen adopts the stored layout
            reopened = DedupIndex(str(tmp_path / "store"), n_buckets=99)
            assert (
                sorted(tuple(r) for r in reopened.probe(probe).collect())
                == probe_before
            )

    def test_rebucket_preserves_first_writer_across_new_run(self, spark, tmp_path):
        """Keeper identity survives the migration: a NEW run registering
        the same content after a rebucket must NOT steal the keeper."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4, run="crawl-a")
        idx.register(_docs(spark, [(10, "alpha"), (20, "beta")]), 0)
        idx.rebucket(spark, 9)
        idx2 = DedupIndex(str(tmp_path / "store"), n_buckets=4, run="crawl-b")
        idx2.register(_docs(spark, [(1, "alpha"), (2, "new-text")]), 0)
        got = {
            r["first_doc_id"]: r["first_batch"]
            for r in idx2.entries(spark).collect()
        }
        assert got == {10: 0, 20: 0, 2: 0}

    def test_rebucket_empty_store_pins_layout(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.rebucket(spark, 16)
        idx.register(_docs(spark, [(0, "alpha")]), 0)
        assert idx._load_manifest()["n_buckets"] == 16

    def test_rebucket_distributed_path_matches_driver(self, spark, tmp_path, monkeypatch):
        """Force the Spark rewrite path (cap=0) and the driver path on
        two copies of one store: identical entries and manifests."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        rows = [(i, f"text-{i % 37}") for i in range(200)]
        stores = {}
        for tag, cap in (("drv", "65536"), ("dist", "0")):
            p = str(tmp_path / tag)
            idx = DedupIndex(p, n_buckets=4)
            idx.register(_docs(spark, rows), 0)
            monkeypatch.setenv("TOMIX_DEDUP_INDEX_DRIVER_CAP", cap)
            idx.rebucket(spark, 11)
            monkeypatch.delenv("TOMIX_DEDUP_INDEX_DRIVER_CAP")
            stores[tag] = sorted(tuple(r) for r in idx.entries(spark).collect())
            assert idx._load_manifest()["n_buckets"] == 11
        assert stores["drv"] == stores["dist"] and len(stores["drv"]) == 37

    def test_rebucket_property_random_batches(self, spark, tmp_path):
        """Property sweep (seeded): random batch contents + random
        bucket-count migration sequences must always equal the dict
        model (first writer wins, rebucket changes nothing)."""
        import random

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        rng = random.Random(0xB0CE)
        for case in range(6):
            p = str(tmp_path / f"s{case}")
            idx = DedupIndex(p, n_buckets=rng.choice([1, 2, 5, 8]))
            model = {}
            doc = 0
            for batch in range(3):
                rows = []
                for _ in range(rng.randrange(1, 12)):
                    t = f"t{rng.randrange(8)}"
                    rows.append((doc, t))
                    if t not in model:
                        model[t] = (doc, batch)
                    doc += 1
                idx.register(_docs(spark, rows), batch)
                if rng.random() < 0.7:
                    idx.rebucket(spark, rng.choice([1, 3, 4, 7, 13]))
            got = {
                (r["first_doc_id"], r["first_batch"])
                for r in idx.entries(spark).collect()
            }
            assert got == set(model.values()), (case, got, model)

    def test_probe_driver_sees_rebucketed_store(self, spark, tmp_path):
        """probe_driver's bucket-frame cache is keyed by generation, so
        a rebucket (new generation, new layout) must be picked up
        immediately — same answers before and after, through the cache."""
        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha"), (2, "beta")]), 0)
        probe = _docs(spark, [(1, "alpha"), (3, "new")]).toPandas()
        before = [
            (int(r.doc_id), bool(r.seen_before))
            for r in idx.probe_driver(probe).itertuples(index=False)
        ]
        idx.rebucket(spark, 7)
        after = [
            (int(r.doc_id), bool(r.seen_before))
            for r in idx.probe_driver(probe).itertuples(index=False)
        ]
        assert before == after == [(1, True), (3, False)]

    def test_probe_driver_rejects_reserved_and_keeps_h_column(self, spark, tmp_path):
        """probe_driver mirrors probe()'s reserved-column contract, and an
        input column literally named 'h' must survive the internal merge
        (probe() keeps it; the driver path must too)."""
        import pandas as pd
        import pytest

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha")]), 0)
        with pytest.raises(ValueError, match="reserved"):
            idx.probe_driver(pd.DataFrame({"doc_id": [1], "text": ["x"],
                                           "seen_before": [False]}))
        out = idx.probe_driver(
            pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "nope"],
                          "h": ["keep-me", "keep-me-too"]})
        )
        assert list(out["h"]) == ["keep-me", "keep-me-too"]
        assert list(out["seen_before"]) == [True, False]

    def test_register_interleaved_into_rebucket_window_serializes(
        self, spark, tmp_path, monkeypatch
    ):
        """Round-10 advice made mechanical: a register arriving INSIDE
        rebucket's read->rewrite->swap window must wait on the writer
        lock and then merge into the REBUCKETED store — never be
        silently superseded by rebucket's manifest swap. The rebucket
        body pauses mid-window (injected), the register fires, and the
        final store must hold BOTH the migrated entries and the new
        batch, at the new bucket count."""
        import threading

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        idx = DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha"), (2, "beta")]), 0)

        in_window = threading.Event()
        release = threading.Event()
        orig = DedupIndex._rebucket_driver_write

        def paused(self, pdf, n_buckets, seq):
            in_window.set()
            assert release.wait(30), "test deadlock: release never set"
            return orig(self, pdf, n_buckets, seq)

        monkeypatch.setattr(DedupIndex, "_rebucket_driver_write", paused)
        errs = []

        def do_rebucket():
            try:
                idx.rebucket(spark, 9)
            except Exception as exc:  # surfaced after join
                errs.append(exc)

        def do_register():
            try:
                idx.register(_docs(spark, [(7, "gamma")]), 1)
            except Exception as exc:
                errs.append(exc)

        ra = threading.Thread(target=do_rebucket)
        ra.start()
        assert in_window.wait(30), "rebucket never reached its window"
        rb = threading.Thread(target=do_register)
        rb.start()
        # the register must BLOCK (not commit, not die) while rebucket
        # holds the writer lock
        rb.join(timeout=1.0)
        assert rb.is_alive(), "register did not serialize behind rebucket"
        release.set()
        ra.join(60)
        rb.join(60)
        assert not errs, f"writer raised: {errs}"
        man = idx._load_manifest()
        assert man["n_buckets"] == 9
        entries = {
            r["first_doc_id"]: r["first_batch"]
            for r in idx.entries(spark).collect()
        }
        # migrated keepers intact AND the interleaved batch present
        assert entries == {0: 0, 2: 0, 7: 1}

    def test_cas_check_fails_loudly_on_noncooperating_writer(
        self, spark, tmp_path, monkeypatch
    ):
        """A writer that bypasses the lock (old code, flock-less mount)
        and commits inside our window must trip the gen_seq CAS at the
        commit point — loud ConcurrentWriteError, never a silent
        supersede of its commit."""
        import contextlib

        from tomixpanel_spark.streaming import dedup_index as di
        from tomixpanel_spark.streaming.genstore import (
            ConcurrentWriteError,
            atomic_json_swap,
        )

        idx = di.DedupIndex(str(tmp_path / "store"), n_buckets=4)
        idx.register(_docs(spark, [(0, "alpha")]), 0)
        # neutralize the lock so the foreign commit can land in-window
        monkeypatch.setattr(di, "writer_lock",
                            lambda path: contextlib.nullcontext())
        orig = di.DedupIndex._merge_driver_write

        def sneak_foreign_commit(self, pdf, man, batch_id, seq):
            out = orig(self, pdf, man, batch_id, seq)
            foreign = dict(self._load_manifest())
            foreign["gen_seq"] = foreign["gen_seq"] + 5
            atomic_json_swap(self._manifest_path(), foreign)
            return out

        monkeypatch.setattr(di.DedupIndex, "_merge_driver_write",
                            sneak_foreign_commit)
        import pytest

        with pytest.raises(ConcurrentWriteError, match="commit token moved"):
            idx.register(_docs(spark, [(1, "beta")]), 1)

    def test_probe_driver_cache_survives_store_recreation(self, spark, tmp_path):
        """Round-10 advice: the per-process bucket-frame cache is keyed
        by (path, bucket, gen) — a store deleted and recreated at the
        same path restarts gen_seq at 0, so without the store-instance
        nonce a probe could serve frames from the DEAD store. The
        recreated store must answer from ITS OWN buckets."""
        import shutil

        from tomixpanel_spark.streaming.dedup_index import DedupIndex

        store = str(tmp_path / "store")
        probe = _docs(spark, [(1, "alpha"), (2, "beta")]).toPandas()
        # ONE bucket: both stores' sole generation collides on the same
        # (path, bucket=0, gen=0) cache key by construction
        idx = DedupIndex(store, n_buckets=1)
        idx.register(_docs(spark, [(0, "alpha")]), 0)
        first = idx.probe_driver(probe)  # fills the cache
        assert list(first["seen_before"]) == [True, False]
        shutil.rmtree(store)
        idx2 = DedupIndex(store, n_buckets=1)
        idx2.register(_docs(spark, [(9, "beta")]), 0)  # same gen numbering
        out = idx2.probe_driver(probe)
        assert list(out["seen_before"]) == [False, True]
        assert list(
            out["first_doc_id"].astype(object).where(out["first_doc_id"].notna(), None)
        ) == [None, 9]


def test_writer_lock_excludes_across_processes(tmp_path):
    """flock is advisory but cross-PROCESS: a second OS process entering
    writer_lock must block until the first releases — the real
    production claim (two ingest jobs, or a rebucket ops task next to a
    live stream). Pure genstore test, no Spark: the child takes the
    lock, signals, holds; the parent's acquisition must not complete
    until the child releases, and the CAS sees the child's commit."""
    import multiprocessing as mp
    import time

    import pytest

    from tomixpanel_spark.streaming.genstore import (
        atomic_json_swap,
        cas_check,
        load_json_manifest,
        writer_lock,
    )

    # the child/timer targets are closures over local state: they need
    # the fork start method (spawn/forkserver would have to pickle them)
    if "fork" not in mp.get_all_start_methods():
        pytest.skip("fork start method unavailable on this platform")
    ctx = mp.get_context("fork")

    manifest = str(tmp_path / "store" / "manifest.json")
    atomic_json_swap(manifest, {"gen_seq": 0})

    def child(manifest, held_flag, release_flag):
        from tomixpanel_spark.streaming.genstore import (
            atomic_json_swap,
            writer_lock,
        )

        with writer_lock(manifest):
            held_flag.set()
            assert release_flag.wait(30)
            atomic_json_swap(manifest, {"gen_seq": 1})

    held = ctx.Event()
    release = ctx.Event()
    proc = ctx.Process(target=child, args=(manifest, held, release))
    proc.start()
    try:
        assert held.wait(30), "child never took the lock"
        t0 = time.monotonic()
        release_timer = ctx.Process(target=lambda e: (time.sleep(0.8), e.set()),
                                    args=(release,))
        release_timer.start()
        with writer_lock(manifest):
            waited = time.monotonic() - t0
            man = load_json_manifest(manifest, "test")
        release_timer.join(30)
        # the parent could only enter AFTER the child's release (>=0.8s
        # hold) and must observe the child's commit inside the lock
        assert waited >= 0.7, f"lock did not exclude across processes ({waited:.2f}s)"
        assert man["gen_seq"] == 1
        # and the CAS tripwire fires against the moved token
        import pytest

        from tomixpanel_spark.streaming.genstore import ConcurrentWriteError

        with pytest.raises(ConcurrentWriteError):
            cas_check("test", str(tmp_path), 0, man["gen_seq"])
    finally:
        release.set()
        proc.join(30)
        if proc.is_alive():
            proc.terminate()
