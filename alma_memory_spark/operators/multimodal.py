"""Multimodal columns: opaque binary payloads with typed metadata, and
the Spark-side plumbing for decode / feature-extract / resize /
frame-sample stages.

Provenance: this module is a BEYOND-THE-REFERENCE capability — the
reference engine (text-only agent memory) has no media surface; these
are the large-scale training-data-pipeline operators the build brief
names as first-class alongside the reference's own inventory.

A 100 TB training-data pipeline treats images/audio/video as `binary`
columns plus typed metadata (mime, width, height, duration, ...) and
runs media ops as Arrow-batched pandas stages over `mapInPandas`. The
image/audio codec libraries are NOT in this container, so the decode
kernels are stubbed two ways:

- `decode_image_udf(fake=True)` (default): a deterministic fake decoder
  that derives pixel stats from the payload bytes — the full Spark
  plumbing (schema, batching, partitioning) is real and tested;
- `fake=False` raises NotImplementedError at the point where Pillow
  would be imported, marking exactly what a real deployment plugs in.

Batch-shape discipline: every stage is `Iterator[pd.DataFrame] ->
Iterator[pd.DataFrame]` so per-executor model/codec init happens once,
and `spark.sql.execution.arrow.maxRecordsPerBatch` bounds memory for
multi-MB payloads (set it low for video frames).
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
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, mime string, width int, height int, "
    "mean_luma double, payload_sha256 string"
)

FRAME_SCHEMA = "media_id string, frame_idx int, frame_payload binary"


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake image decode: dimensions and luminance derived
    from a hash of the bytes — stable for tests, clearly not a codec."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = h[2] / 255.0
    return width, height, mean_luma


def decode_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Image decode + feature extraction stage over mapInPandas.

    With fake=False this is where Pillow/libvips would decode; the
    container has neither, so it raises NotImplementedError (stub
    boundary per the build contract)."""
    if not fake:
        raise NotImplementedError(
            "real image decoding requires Pillow/libvips, not present in "
            "this environment; use fake=True for plumbing tests"
        )
    from alma_memory_spark.session import ensure_package_shipped

    # the kernel closure references module-level code — executor
    # workers need the addPyFile zip (callers outside the repo cwd
    # crashed with ModuleNotFoundError before this)
    ensure_package_shipped(media.sparkSession)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b or b"")))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": feats.map(lambda t: t[0]).astype("int32"),
                    "height": feats.map(lambda t: t[1]).astype("int32"),
                    "mean_luma": feats.map(lambda t: t[2]),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b or b"")).hexdigest()
                    ),
                }
            )
            yield out

    return media.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def resize_stage(features: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize planning: pure column math (target dims, scale factor); the
    pixel resample itself belongs in the decode kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return (
        features.withColumn("scale", scale)
        .withColumn("target_w", F.ceil(F.col("width") * scale).cast("int"))
        .withColumn("target_h", F.ceil(F.col("height") * scale).cast("int"))
    )


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: explode deterministic frame indices
    per media row; the frame payload is a sliced stand-in (a real ffmpeg
    kernel plugs into the same row shape)."""
    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"] or b"")
                n = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                for i in range(n):
                    lo = i * every_n
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_payload": payload[lo : lo + every_n],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return media.mapInPandas(_batches, FRAME_SCHEMA)


def media_stats(features: DataFrame) -> DataFrame:
    """Corpus-level media stats (per mime): counts, dim ranges — the
    quality-gate aggregation for multimodal pipelines."""
    return features.groupBy("mime").agg(
        F.count("*").alias("n"),
        F.min("width").alias("min_w"),
        F.max("width").alias("max_w"),
        F.avg("mean_luma").alias("avg_luma"),
    )
