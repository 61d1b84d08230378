"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container — see `decode_image`): what IS real and tested is the Spark-side
contract a 100 TB media pipeline needs — schema, batch shape, partition
sizing, and the UDF signatures — so dropping in a real decoder (PIL/ffmpeg)
is a one-function change on the executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, "
    "feature array<float>, decode_ok boolean"
)


def decode_image(payload: bytes) -> np.ndarray:
    """REAL decode requires an image library absent from this container.

    Deterministic-fake policy for tests: derive a fixed 8-float 'feature'
    from the payload bytes so the pipeline is exercisable end-to-end; swap
    this body for PIL/torchvision on a real cluster. md5 (not a faster
    non-cryptographic hash) so the DuckDB oracle can recompute the fake
    features byte-for-byte."""
    if payload is None:
        raise NotImplementedError("no payload")
    digest = hashlib.md5(payload).digest()
    return np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0


def extract_media_features(df: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """mapInPandas over the media table: per Arrow batch, hash + (stub)
    decode + fixed-width feature vector. Binary payloads make batches heavy,
    so upstream should `repartition` by size, not row count — document the
    knob: spark.sql.files.maxPartitionBytes for file scans, and an explicit
    repartition(n) after filtering."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "media_id": b["media_id"],
                "kind": b["kind"],
                "n_bytes": b["payload"].map(lambda p: len(p) if p is not None else 0),
                "digest": b["payload"].map(
                    lambda p: hashlib.md5(p).hexdigest() if p is not None else None
                ),
            }
            feats, oks = [], []
            for p in b["payload"]:
                try:
                    feats.append(decode_image(p).tolist())
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            out["feature"] = feats
            out["decode_ok"] = oks
            yield pd.DataFrame(out)

    return df.mapInPandas(_gen, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract (the decode itself is the stub above).
    Demonstrates the explode-based fan-out shape: one row per (video, frame_ts)."""
    from pyspark.sql import functions as F

    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
