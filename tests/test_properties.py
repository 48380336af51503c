"""Property-based tests (hypothesis) for the pure-Python engine pieces:
batching invariants and canonical scalar semantics. These run WITHOUT a
SparkSession — they pin the driver-side contracts that the distributed
paths rely on."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from tomixpanel_spark.sinks.batching import batch_payload, iter_batches, serialize_record

records = st.lists(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.one_of(st.integers(), st.text(max_size=50), st.none(), st.booleans()),
        max_size=6,
    ),
    max_size=200,
)


class TestBatchingProperties:
    @given(records, st.integers(1, 50), st.integers(64, 4096))
    @settings(max_examples=150, deadline=None)
    def test_caps_hold_and_nothing_lost_or_reordered(self, recs, max_records, max_bytes):
        batches = list(iter_batches(iter(recs), max_records, max_bytes))
        # completeness + order: concatenation reproduces the input stream
        flat = [b for batch in batches for b in batch]
        assert flat == [serialize_record(r) for r in recs]
        for batch in batches:
            assert len(batch) <= max_records
            body = b"[" + b",".join(batch) + b"]"
            # byte cap holds unless a single record alone exceeds it
            assert len(body) <= max_bytes or len(batch) == 1
        # no empty batches ever
        assert all(batch for batch in batches)

    @given(records)
    @settings(max_examples=50, deadline=None)
    def test_payload_roundtrip(self, recs):
        if not recs:
            return
        batch = [serialize_record(r) for r in recs]
        gz = batch_payload(batch, gzip=True)
        plain = batch_payload(batch, gzip=False)
        import gzip as g

        assert json.loads(g.decompress(gz)) == json.loads(plain) == recs


class TestGreedyPackingOptimality:
    @given(st.lists(st.integers(1, 500), min_size=1, max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_no_adjacent_merge_possible(self, sizes):
        """Greedy packing is locally optimal: no two ADJACENT batches could
        be merged without breaking a cap (else the sink wastes requests)."""
        recs = [{"p": "x" * n} for n in sizes]
        max_bytes = 600
        batches = list(iter_batches(iter(recs), 1000, max_bytes))
        for a, b in zip(batches, batches[1:]):
            merged = b"[" + b",".join(a + b) + b"]"
            assert len(merged) > max_bytes
