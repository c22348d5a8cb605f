"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media rides as an opaque ``binary`` column plus typed metadata
(modality, codec, width/height/duration).  All Spark-side mechanics —
schema, partitioning, Arrow batch shape, UDF signatures — are real and
tested; the codec work itself (decode, resize, frame-sample, feature
extraction) is stubbed because the image/audio libraries are not in
this container.  Each stub either raises NotImplementedError (strict
mode) or produces a deterministic fake (plumbing-test mode) — swap the
inner function body for PIL/torchaudio/ffmpeg in a real deployment.

Scale notes:
  - mapInPandas streams Arrow record batches; peak executor memory is
    one batch of blobs, not one partition — cap
    spark.sql.execution.arrow.maxRecordsPerBatch when blobs are large.
  - decode → feature is a narrow transform: no shuffle; partition count
    follows the input files, so 100 TB of media parallelizes by input
    split.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

def _fake_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real encoder: sha256-seeded floats in
    [0,1).  REAL DEPLOYMENT: replace with the model forward pass."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]

def decode_and_featurize(
    media: DataFrame, batch_size_hint: int = 64, strict: bool = False
) -> DataFrame:
    """Decode blobs and emit per-item features via mapInPandas.

    The Arrow plumbing (schema in/out, batch iteration, column pruning
    of untouched metadata) is production-shaped; only `_decode` is a
    stub.  strict=True surfaces the NotImplementedError a real codec
    integration would remove.
    """

    def _decode(payload: bytes, modality: str) -> list[float]:
        if strict:
            raise NotImplementedError(
                "codec decode not available in this environment; "
                "plug in PIL/torchaudio/ffmpeg here"
            )
        return _fake_embedding(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": [
                        _decode(p, m)
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )
            yield out

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )

def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video → frame rows (one row per sampled frame).  The exploding
    row-shape and timestamps are real; frame extraction is stubbed as a
    deterministic slice of the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                if r["modality"] != "video":
                    continue
                n = min(max_frames, max(1, int((r["duration_ms"] or 0) // every_ms)))
                payload = r["payload"] or b""
                for i in range(n):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(i * every_ms)
                    # REAL DEPLOYMENT: ffmpeg seek+decode; stub slices bytes
                    rows["frame"].append(payload[i::n][:256])
            yield pd.DataFrame(rows)

    return media.select("media_id", "modality", "duration_ms", "payload").mapInPandas(
        run, FRAME_SAMPLE_SCHEMA
    )

def media_summary(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata rollup (no Python): per modality/codec counts,
    size stats — the catalog query a 100 TB media lake answers before
    any decode."""
    return media.groupBy("modality", "codec").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )

def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 32))
        rows.append(
            (
                i,
                modality,
                {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                64 + i, 48 + i,
                (i % 10) * 1000,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
