"""Streaming dedup: cross-batch keep-first semantics, watermark-bounded
state, and batch/stream signature parity (the lambda-split contract)."""

from __future__ import annotations

import json
import os
import time as _time


def _write_batches(in_dir, batches):
    in_dir.mkdir()
    now = _time.time()
    for i, (name, lines) in enumerate(batches):
        p = in_dir / f"{name}.ndjson"
        p.write_text("\n".join(json.dumps(x) for x in lines))
        os.utime(p, (now - 120 + i * 60,) * 2)


class TestStreamingExactDedup:
    def test_cross_batch_keep_first(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup import streaming_exact_dedup

        in_dir = tmp_path / "docs"
        _write_batches(
            in_dir,
            [
                ("b1", [{"doc_id": 1, "text": "alpha beta gamma"},
                        {"doc_id": 2, "text": "delta epsilon zeta"}]),
                # b2: doc 3 duplicates doc 1's content (whitespace/case
                # differences collapse under the canonical fingerprint)
                ("b2", [{"doc_id": 3, "text": "  Alpha  Beta   GAMMA "},
                        {"doc_id": 4, "text": "eta theta iota"}]),
            ],
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        out = streaming_exact_dedup(stream)
        collected = []
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: collected.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ids = sorted(r["doc_id"] for r in collected)
        assert ids == [1, 2, 4]  # doc 3 deduped across micro-batches

    def test_watermark_bounds_state(self, spark, tmp_path):
        """In-horizon duplicates drop (the hard guarantee), and advancing
        the watermark EVICTS expired fingerprint state — state size tracks
        arrival rate x horizon, not corpus size. (Dedup beyond the horizon
        is allowed-but-not-guaranteed by dropDuplicatesWithinWatermark:
        eviction lags a batch, so no assertion on a late dup re-emitting.)
        """
        from tomixpanel_spark.streaming.dedup import streaming_exact_dedup

        base = "2024-01-01T{h:02d}:00:00.000Z"
        in_dir = tmp_path / "docs"
        _write_batches(
            in_dir,
            [
                ("b1", [{"doc_id": 1, "ts": base.format(h=0), "text": "same text here"},
                        {"doc_id": 2, "ts": base.format(h=0), "text": "other text one"}]),
                # in-horizon duplicate (event time 00:30, horizon 1h) plus
                # an event advancing the watermark far past the horizon
                ("b2", [{"doc_id": 3, "ts": "2024-01-01T00:30:00.000Z", "text": "same text here"},
                        {"doc_id": 4, "ts": base.format(h=9), "text": "advance the clock"}]),
                # fresh content after the watermark advanced: emits, and by
                # now the expired fingerprints must have been evicted
                ("b3", [{"doc_id": 5, "ts": base.format(h=10), "text": "fresh content now"}]),
            ],
        )
        stream = (
            spark.readStream.schema("doc_id long, ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        out = streaming_exact_dedup(stream, ts_col="ts", watermark_delay="1 hour")
        collected = []
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: collected.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ids = sorted(r["doc_id"] for r in collected)
        assert ids == [1, 2, 4, 5]  # doc 3 (in-horizon dup) dropped
        state_rows = [
            s["numRowsTotal"]
            for p in q.recentProgress
            for s in (p.get("stateOperators") or [])
        ]
        # state grew to >=3 fingerprints, then eviction shrank it after the
        # watermark passed their horizons — bounded, not corpus-sized
        assert max(state_rows) >= 3
        assert state_rows[-1] < max(state_rows)


class TestStreamingMergeEdges:
    def test_edges_dedupe_across_batches_and_match_batch_path(self, spark, tmp_path):
        from tomixpanel_spark.streaming.dedup import streaming_merge_edges
        from tomixpanel_spark.transforms.amplitude import amp_merges

        rows_b1 = [
            {"user_id": "u1", "device_id": "d1"},
            {"user_id": "u2", "device_id": "d2"},
            {"user_id": "", "device_id": "d9"},  # falsy user: no edge
        ]
        rows_b2 = [
            {"user_id": "u1", "device_id": "d1"},  # repeat edge, must dedupe
            {"user_id": "u1", "device_id": "d3"},
            {"user_id": "u3", "device_id": None},  # null device: no edge
        ]
        in_dir = tmp_path / "ev"
        _write_batches(in_dir, [("b1", rows_b1), ("b2", rows_b2)])
        stream = (
            spark.readStream.schema("user_id string, device_id string")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        out = streaming_merge_edges(stream, run_time_ms=42)
        collected = []
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: collected.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r["id_a"], r["id_b"], r["insert_id"], r["time_ms"]) for r in collected}

        batch_df = spark.createDataFrame(
            [(r["user_id"], r["device_id"]) for r in rows_b1 + rows_b2],
            "user_id string, device_id string",
        )
        want = {
            (r["id_a"], r["id_b"], r["insert_id"], r["time_ms"])
            for r in amp_merges(batch_df, run_time_ms=42).collect()
        }
        assert got == want  # same edges, same canonical ids, deduped once


class TestStreamingSignatures:
    def test_stream_signatures_equal_batch(self, spark, tmp_path):
        """Lambda-split contract: signatures computed on the stream are
        byte-identical to the batch query's over the same rows."""
        from tomixpanel_spark.operators.dedup import (
            minhash_columns,
            shingle_arrays_for,
        )
        from tomixpanel_spark.streaming.dedup import streaming_minhash_signatures

        rows = [
            {"doc_id": i, "text": f"w{i % 5} common tokens flow here w{i % 3} tail"}
            for i in range(20)
        ]
        in_dir = tmp_path / "docs"
        _write_batches(in_dir, [("b1", rows[:10]), ("b2", rows[10:])])
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        out = streaming_minhash_signatures(stream)
        collected = []
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: collected.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        batch_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        want = {
            tuple(r) for r in shingle_arrays_for(batch_df).select(
                "doc_id", *minhash_columns()
            ).collect()
        }
        got = {tuple(r) for r in collected}
        assert got == want and len(got) == 20


class TestStreamingCountMin:
    def test_microbatch_merge_equals_batch_sketch(self, spark, tmp_path):
        """Mergeability, the sketch contract: cell-wise merging per-batch
        partial sketches across micro-batches yields EXACTLY the batch
        sketch of the union, and point estimates match the batch query's
        md5 arithmetic (never under the true count)."""
        from tomixpanel_spark.operators.textops import cms_sketch
        from tomixpanel_spark.streaming.sketches import StreamingCountMin

        rows = [
            {"doc_id": i, "text": f"alpha beta w{i % 4} gamma alpha tail{i % 7}"}
            for i in range(30)
        ]
        in_dir = tmp_path / "docs"
        _write_batches(in_dir, [("b1", rows[:13]), ("b2", rows[13:])])
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        cms = StreamingCountMin()
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(cms.update_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert cms.n_batches >= 2  # really exercised the merge path

        batch_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        import numpy as np

        want = np.zeros_like(cms.cells)
        for r in cms_sketch(batch_df).collect():
            want[r["row"], r["bucket"]] = r["c"]
        assert (cms.cells == want).all()

        # estimates: >= truth, == truth for tokens with collision-free rows
        true_alpha = sum(2 for _ in rows)  # "alpha" appears twice per doc
        assert cms.estimate("alpha") >= true_alpha
        assert cms.estimate("beta") >= len(rows)
        # a token never ingested can only hit collision mass
        assert cms.estimate("zzz-never-seen") >= 0

    def test_parallel_merge_order_irrelevant(self, spark):
        from tomixpanel_spark.streaming.sketches import StreamingCountMin

        a_rows = [(1, "x y z x"), (2, "y z")]
        b_rows = [(3, "z q"), (4, "x q q")]
        df_a = spark.createDataFrame(a_rows, "doc_id long, text string")
        df_b = spark.createDataFrame(b_rows, "doc_id long, text string")
        ab, ba = StreamingCountMin(), StreamingCountMin()
        a1, b1 = StreamingCountMin(), StreamingCountMin()
        a1.update_batch(df_a); b1.update_batch(df_b)
        ab.merge(a1).merge(b1)
        b2, a2 = StreamingCountMin(), StreamingCountMin()
        b2.update_batch(df_b); a2.update_batch(df_a)
        ba.merge(b2).merge(a2)
        assert (ab.cells == ba.cells).all()
        assert ab.estimate("q") == 3 or ab.estimate("q") >= 3


class TestStreamingIncrementalParity:
    def test_stream_union_equals_batch_transform(self, spark):
        """The registered fused-path query (readStream json +
        foreachBatch running the real amp_events transform) must union
        to exactly the batch transform's rows — micro-batch boundaries
        must be invisible in the result."""
        from tomixpanel_spark.operators.streaming_parity import (
            streaming_incremental_parity,
        )
        from tomixpanel_spark.operators.transform_parity import amp_transform

        sf = "/root/testdata/sf0.001"
        got = streaming_incremental_parity(spark, sf)
        want = amp_transform(spark, sf)
        assert sorted(got.columns) == sorted(want.columns)
        canon = lambda df: sorted(  # noqa: E731
            map(tuple, df.select(*sorted(df.columns)).collect())
        )
        assert canon(got) == canon(want)
