"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container ships no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake — see ``_fake_decode``) while
everything Spark-side is real and tested: schemas, Arrow batch
shapes, partition-sized batching through ``mapInPandas``, and the
metadata extraction path.  Swapping ``_fake_decode`` for
PIL/libav does not change any plan.

Scale notes: binary payloads ride in their own column so column
pruning keeps them out of every query that doesn't decode;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds per-batch
memory (payload bytes × batch rows); feature extraction is a
map-only pass — no shuffle touches the binary column.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image|audio|video
    StructField("mime", StringType(), False),
    StructField("payload", BinaryType(), False),   # opaque bytes
    StructField("meta_width", IntegerType(), True),
    StructField("meta_height", IntegerType(), True),
    StructField("meta_duration_ms", IntegerType(), True),
])

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the payload
    bytes (md5-seeded).  Real deployment replaces this with
    PIL.Image.open / soundfile / pyav frame sampling —
    NotImplementedError marks the seam."""
    if payload is None:
        raise NotImplementedError(
            "real media decoding requires PIL/libav (not in container)")
    digest = hashlib.md5(bytes(payload)).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    rows = []
    kinds = [("image", "image/png"), ("audio", "audio/wav"),
             ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        payload = (f"{kind}-{i}".encode() * 17)[:256]
        rows.append((i, kind, mime, payload,
                     64 + i % 8 if kind != "audio" else None,
                     48 + i % 8 if kind != "audio" else None,
                     1000 * (i % 30) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata pass — never touches payload bytes (column pruning:
    the parquet scan must not read ``payload``; verify via
    .explain ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg("meta_width").alias("avg_width"),
        F.avg("meta_duration_ms").alias("avg_duration_ms"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ])

    def fn(batches):
        import pandas as pd
        for pdf in batches:
            feats = [_fake_decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=schema)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for video/audio: one output row per sampled
    timestamp — a 1→N mapInPandas, which is the batch shape a real
    pyav frame sampler needs (decode stub: features are a
    deterministic function of (payload, frame_ts))."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("frame_ts_ms", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ])

    def fn(batches):
        import pandas as pd
        for pdf in batches:
            out = {"media_id": [], "frame_ts_ms": [], "features": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["meta_duration_ms"]):
                for ts in range(0, int(dur or 0) + 1, every_ms):
                    out["media_id"].append(mid)
                    out["frame_ts_ms"].append(ts)
                    out["features"].append(_fake_decode(
                        bytes(payload) + ts.to_bytes(4, "big")).tolist())
            yield pd.DataFrame(out)

    return (media.where(F.col("kind").isin("video", "audio"))
            .select("media_id", "payload", "meta_duration_ms")
            .mapInPandas(fn, schema=schema))
