"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque BINARY
column riding next to typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes cross the
JVM<->Python boundary in columnar batches, never row-at-a-time. The decode
step itself is STUBBED here (no image/audio libs in this environment — see
``decode_payload``); the Spark-side plumbing (schema, batch shape, UDF
signature, partitioning) is real and tested.

``multimodal_meta`` doubles as the oracle-checked query: metadata extraction
(byte length, sha256 content hash, magic-byte format sniff) over payloads —
computed in pandas batches, hash-identical to the DuckDB SQL mirror.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tomixpanel_spark.operators.base import QuerySpec, table

# Canonical multimodal record: payload + typed metadata (media_type mirrors
# a MIME type; meta keys are per-modality, e.g. width/height/sample_rate).
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("sniffed", StringType(), True),
    ]
)

_MAGIC = (  # deterministic magic-byte sniffer (a few real signatures)
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
)


def sniff_format(payload: bytes) -> str:
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def decode_payload(payload: bytes, media_type: str):
    """Decode an image/audio payload into arrays.

    STUB: the runtime has no PIL/librosa/ffmpeg. Production wires a real
    decoder through ``extract_metadata(decoder=...)``; tests inject a
    deterministic fake. Raising (rather than silently returning None) keeps
    the contract honest.
    """
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; inject decoder= into the mapInPandas stage"
    )


def extract_metadata(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    decoder: Optional[Callable[[bytes, str], object]] = None,
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary payload column.

    One pass, partition-parallel, no shuffle. ``decoder`` (optional) is
    called per payload for modality-specific features; omitted => metadata
    only.
    """
    import hashlib

    from tomixpanel_spark.session import ship_package

    ship_package(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "sniffed": payloads.map(
                        lambda b: sniff_format(bytes(b)) if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(batches, schema=META_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked query: treat document text as an opaque utf-8 payload
    and extract metadata through the real mapInPandas path."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    meta = extract_metadata(payloads)
    return meta.select(
        F.col("item_id").alias("doc_id"), "n_bytes", F.col("sha256").alias("sha_hex")
    )


_MULTIMODAL_META_SQL = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha_hex
FROM documents
"""



FEATURE_SCHEMA = (
    "item_id long, media_type string, width int, height int, "
    "n_frames int, features array<float>"
)


def fake_image_decoder(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real decoder (PIL/ffmpeg absent):
    derives dimensions and a fixed-length feature vector from the payload
    bytes. Tests inject this; production injects the real decode."""
    h = hashlib_sha(payload)
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "n_frames": 1 if media_type.startswith("image") else 1 + h[2] % 8,
        "features": [b / 255.0 for b in h[:8]],
    }


def hashlib_sha(payload: bytes) -> bytes:
    import hashlib

    return hashlib.sha256(payload).digest()


def transform_media(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] = decode_payload,
    resize_to: Optional[tuple[int, int]] = None,
    frame_sample_every: int = 1,
) -> DataFrame:
    """Decode / feature-extract / resize / frame-sample as ONE Arrow-batched
    mapInPandas stage (the multimodal hot path).

    * ``decoder(payload, media_type) -> {width, height, n_frames,
      features}`` — the pluggable decode step (stubbed by default:
      ``decode_payload`` raises; tests inject ``fake_image_decoder``).
    * ``resize_to`` — target (w, h) recorded post-decode (the real resize
      happens inside the decoder in production; the plumbing carries the
      declared output shape so downstream schemas are static).
    * ``frame_sample_every`` — keep every Nth frame's worth of features
      for video/audio payloads (n_frames is divided accordingly).

    Partition-parallel, no shuffle; batch shape is rows-in -> rows-out.
    """
    from tomixpanel_spark.session import ship_package

    ship_package(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rec in pdf.to_dict("records"):
                payload = rec.get("payload")
                if payload is None:
                    continue
                meta = decoder(bytes(payload), rec.get("media_type") or "")
                w, h = (resize_to if resize_to else (meta["width"], meta["height"]))
                n_frames = max(1, meta["n_frames"] // max(1, frame_sample_every))
                out.append(
                    {
                        "item_id": rec["item_id"],
                        "media_type": rec.get("media_type"),
                        "width": w,
                        "height": h,
                        "n_frames": n_frames,
                        "features": meta["features"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id",
                    "media_type",
                    "width",
                    "height",
                    "n_frames",
                    "features",
                ],
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)

REGISTRY = {
    "multimodal_meta": QuerySpec(multimodal_meta, _MULTIMODAL_META_SQL, "ext:multimodal"),
}
